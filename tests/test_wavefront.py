"""Wavefront trace (ops.pallas.wavefront): equality vs the fused megakernel
and the recorded-selection gradient path, in interpret mode on CPU.

The wavefront path is the production triangle-scale forward (sorted ray
batches + shortlist sweep). Its contract: bit-identical colors to
`megakernel.trace_fused(key=...)` on the same scene/key (same threefry
uniforms per original ray id, order-independent closest hit with the same
Morton tie-break), in every mode (culled / brute / tile-hinted /
recording)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptre_tpu.models import mesh as mg
from ptre_tpu.models.scene import Model, Scene
from ptre_tpu.ops import camera as cam_ops, rng
from ptre_tpu.ops.pallas import fused_grad, megakernel as mk, wavefront as wf
from ptre_tpu.render import pathtracer as pt
from ptre_tpu.utils.config import RenderConfig

# slow tier: interpret-mode wavefront kernels (run with `pytest -m slow`)
pytestmark = pytest.mark.slow

W = H = 8


def _setup(diffuse=False):
    scn = Scene()
    scn.add_mesh("ball", mg.uv_sphere(False, 12, 6,
                                      mesh_type=mg.MeshType.TRIANGLES))
    scn.add_mesh("ground", mg.uv_sphere(False, 8, 4))
    scn.add_model("b", Model("ball"))
    scn.get_model("b").set_transforms(1.0, 0.0, (0.0, 0.5, 0.0))
    if diffuse:
        scn.get_model("b").set_material(0)
    scn.add_model("g", Model("ground"))
    scn.get_model("g").set_transforms(10.0, 0.0, (0.0, -10.0, 0.0))
    pkt = scn.build_packet(tri_pad=64)
    cfg = RenderConfig(width=W, height=H)
    cam = cam_ops.Camera.create(width=W, height=H)
    key = rng.key_for(3)
    px, py = pt.pixel_grid(H, W)
    jit = rng.pixel_jitter(key, (px.shape[0],))
    o, d = cam_ops.get_rays(cam, px, py, jit)
    return pkt, cfg, o, d, key


def test_matches_megakernel_all_modes():
    pkt, cfg, o, d, key = _setup()
    ref = np.asarray(
        mk.trace_fused(0, o, d, pkt, cfg, key=key, interpret=True, cull=True))
    assert np.isfinite(ref).all() and ref.max() > 0.05
    for cull in (True, False):
        for hint in (None, (H, W)):
            got = np.asarray(wf.trace(key, o, d, pkt, cfg, cull=cull,
                                      interpret=True, tile_hint=hint))
            np.testing.assert_allclose(got, ref, atol=1e-6,
                                       err_msg=f"cull={cull} hint={hint}")


def test_matches_megakernel_deep_paths():
    # diffuse (Oren-Nayar) ball: paths live past bounce 1, exercising the
    # inter-bounce sort + the skip-sort cond
    pkt, cfg, o, d, key = _setup(diffuse=True)
    ref = np.asarray(
        mk.trace_fused(0, o, d, pkt, cfg, key=key, interpret=True, cull=True))
    got = np.asarray(wf.trace(key, o, d, pkt, cfg, interpret=True,
                              tile_hint=(H, W)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_record_mode_color_and_selection_shapes():
    pkt, cfg, o, d, key = _setup()
    ref = np.asarray(
        mk.trace_fused(0, o, d, pkt, cfg, key=key, interpret=True))
    col, sel, ur, perm_tri = wf.trace(key, o, d, pkt, cfg, record=True,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(col), ref, atol=1e-6)
    R = o.shape[0]
    assert sel.shape == (cfg.max_depth, 4, R)
    assert ur.shape == (2 * cfg.max_depth, R)
    assert float(sel[0, 3].mean()) > 0.3  # bounce 0 hits something
    assert perm_tri is not None


def test_trace_grad_wavefront_matches_culled_route():
    """The fused gradient path through the wavefront forward must produce
    the same value AND gradients as through the megakernel culled forward
    (identical selections + uniforms -> identical backward)."""
    pkt, cfg, o, d, key = _setup(diffuse=True)

    def loss_via(force):
        def f(radius):
            p = pkt.replace(sph_radius=radius)
            c = fused_grad.trace_grad(key, o, d, p, cfg, interpret=True,
                                      force=force)
            return jnp.mean(c)

        return jax.value_and_grad(f)(pkt.sph_radius)

    v_wave, g_wave = loss_via(None)  # auto -> wavefront (non-dense... )
    v_cull, g_cull = loss_via("culled")
    np.testing.assert_allclose(float(v_wave), float(v_cull), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_wave), np.asarray(g_cull),
                               rtol=1e-5, atol=1e-7)
    assert np.abs(np.asarray(g_wave)).max() > 0.0


def test_empty_and_sphere_only_scenes():
    cfg = RenderConfig(width=W, height=H)
    cam = cam_ops.Camera.create(width=W, height=H)
    key = rng.key_for(5)
    px, py = pt.pixel_grid(H, W)
    jit = rng.pixel_jitter(key, (px.shape[0],))
    o, d = cam_ops.get_rays(cam, px, py, jit)

    empty = Scene().build_packet()
    got = np.asarray(wf.trace(key, o, d, empty, cfg, interpret=True))
    ref = np.asarray(mk.trace_fused(0, o, d, empty, cfg, key=key,
                                    interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)

    scn = Scene()
    scn.add_mesh("s", mg.uv_sphere(False, 8, 4))
    scn.add_model("m", Model("s"))
    scn.get_model("m").set_transforms(1.0, 0.0, (0.0, 0.5, 4.0))
    pkt = scn.build_packet()
    got = np.asarray(wf.trace(key, o, d, pkt, cfg, interpret=True))
    ref = np.asarray(mk.trace_fused(0, o, d, pkt, cfg, key=key,
                                    interpret=True))
    # sphere-only scenes route trace_fused to the DENSE kernel, which
    # re-normalizes the (already unit up to rounding) sphere normal where
    # the lane-parallel/wavefront kernels don't -> ~1e-6 shading wiggle
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_supports_gates():
    pkt, _, _, _, _ = _setup()
    assert wf.supports(pkt)
