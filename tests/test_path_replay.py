"""Fused-sweep gradient path: selection kernel + differentiable XLA replay.

The fused megakernel (interpret mode on CPU) records per-bounce primitive
selections; `ops.path_replay.replay` must reproduce the kernel's color from
them exactly (same external threefry uniforms, same scatter math), and
gradients through the replay must match the staged integrator's
finite-difference behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ptre_tpu.models import demo
from ptre_tpu.ops import camera as cam_ops, path_replay, rng
from ptre_tpu.ops.pallas import megakernel as mk
from ptre_tpu.render import pathtracer as pt
from ptre_tpu.utils.config import RenderConfig
import pytest

# slow tier: differentiable replay (interpret-mode core) (run with `pytest -m slow`)
pytestmark = pytest.mark.slow


def _scene_rays(w=24, h=16):
    scn = demo.reference_demo_scene(12, 6)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=w, height=h)
    px, py = pt.pixel_grid(h, w)
    key = rng.key_for(1984)
    jitter = rng.pixel_jitter(rng.fold(key, 0x9E37), (px.shape[0],))
    o, d = cam_ops.get_rays(cam, px, py, jitter)
    return pkt, cam, o, d, key


def test_replay_matches_fused_kernel_exactly():
    pkt, _, o, d, key = _scene_rays()
    cfg = RenderConfig(width=24, height=16)

    # kernel forward with external uniforms (the reference fused result)
    color_kernel = mk.trace_fused(0, o, d, pkt, cfg, key=key, interpret=True)
    # selection + replay must walk the same paths to the same color
    sel, urand = mk.trace_fused_sel(key, o, d, pkt, cfg, interpret=True)
    color_replay = path_replay.replay(o, d, sel, urand, pkt, cfg)

    np.testing.assert_allclose(
        np.asarray(color_kernel), np.asarray(color_replay), rtol=2e-4, atol=2e-5
    )


def test_trace_fused_grad_matches_kernel_forward():
    pkt, _, o, d, key = _scene_rays()
    cfg = RenderConfig(width=24, height=16)
    color_kernel = mk.trace_fused(0, o, d, pkt, cfg, key=key, interpret=True)
    color = path_replay.trace_fused_grad(key, o, d, pkt, cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(color_kernel), np.asarray(color), rtol=2e-4, atol=2e-5
    )


def test_grad_sweep_config_dispatch():
    """grad_sweep='fused' routes integrator.trace through the replay."""
    from ptre_tpu.ops import integrator

    pkt, _, o, d, key = _scene_rays()
    cfg_fused = RenderConfig(width=24, height=16, grad_sweep="fused")
    cfg_staged = RenderConfig(width=24, height=16, grad_sweep="staged")
    c_fused = integrator.trace(key, o, d, pkt, cfg_fused)
    c_staged = integrator.trace(key, o, d, pkt, cfg_staged)
    # different RNG stream conventions → images agree in aggregate, not
    # per-sample; sky-only pixels (top rows) must match exactly
    top = slice(0, 24)  # first image row: all sky in the demo framing
    np.testing.assert_allclose(
        np.asarray(c_fused)[top], np.asarray(c_staged)[top], atol=1e-6
    )
    assert abs(float(c_fused.mean()) - float(c_staged.mean())) < 0.05


def test_replay_gradients_match_finite_differences():
    """FD check of d(mean color)/d(sphere radius) through the fused-sweep
    replay — the same setup as the staged-path test
    (test_integrator.test_gradient_wrt_sphere_radius_matches_fd): centered
    8x8 rays without jitter so no silhouette flip occurs at ±1e-3."""
    scn = demo.reference_demo_scene(8, 4)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=8, height=8)
    px, py = pt.pixel_grid(8, 8)
    o, d = cam_ops.get_rays(cam, px, py, jnp.zeros((64, 2)))
    key = rng.key_for(10)
    cfg = RenderConfig(width=8, height=8)

    def f(dr):
        p2 = pkt.replace(sph_radius=pkt.sph_radius + dr)
        c = path_replay.trace_fused_grad(key, o, d, p2, cfg, interpret=True)
        return jnp.mean(c)

    g = float(jax.grad(f)(jnp.float32(0.0)))
    eps = 1e-3
    fd = (float(f(jnp.float32(eps))) - float(f(jnp.float32(-eps)))) / (2 * eps)
    # detached visibility: gradients flow through shading/geometry terms
    # only, so FD (which includes silhouette shifts) agrees loosely
    np.testing.assert_allclose(g, fd, rtol=0.1, atol=1e-3)
    assert abs(g) > 1e-4


def test_replay_gradients_albedo_exact_fd():
    """Albedo gradients have no visibility discontinuity → tight FD match."""
    pkt, _, o, d, key = _scene_rays()
    cfg = RenderConfig(width=24, height=16)

    def f(s):
        p2 = pkt.replace(mat_albedo=pkt.mat_albedo * s)
        c = path_replay.trace_fused_grad(key, o, d, p2, cfg, interpret=True)
        return jnp.mean(c)

    g = float(jax.grad(f)(1.0))
    eps = 1e-3
    fd = (float(f(1.0 + eps)) - float(f(1.0 - eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=2e-2, atol=1e-4)
