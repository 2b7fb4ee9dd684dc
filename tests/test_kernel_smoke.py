"""Default-tier smoke tests: one tiny-shape invocation per Pallas kernel
family, so `pytest -q` exercises every production kernel path.

The full kernel parity suites live in the slow tier (test_wavefront.py,
test_megakernel.py, test_dual_pipeline.py, ...) and take minutes each in
interpret mode; a regression in the flagship kernels must not be
invisible to a sub-hour run, so this module runs each family once at the
smallest shape the kernel supports:

* on CPU (the default test platform) each call runs in Pallas INTERPRET
  mode at the minimum lane shapes — the assertions are sanity checks
  (finite, in-range, gradient flows), because interpret-mode execution
  of the large kernel bodies costs tens of seconds each and the deep
  parity comparisons already live in the slow tier;
* with ``PTRE_TEST_TPU=1`` (see conftest) the same calls compile and run
  on the real chip in seconds AND the raster smokes additionally compare
  against the XLA reference — the recommended pre-commit check on TPU
  hosts: ``PTRE_TEST_TPU=1 pytest tests/test_kernel_smoke.py``.

The soft-raster BACKWARD kernel is the one family whose interpret-mode
cost is irreducible (~3 min alone — its in-kernel recompute+vjp body
dwarfs the others), so its smoke runs on the chip only; its CPU coverage
is the slow tier's `test_soft_kernel_matches_xla_values_and_gradients`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptre_tpu.models import mesh as mg
from ptre_tpu.models.scene import Model, Scene
from ptre_tpu.ops import camera as cam_ops, rng
from ptre_tpu.render import pathtracer as pt
from ptre_tpu.render import rasterizer as ras
from ptre_tpu.utils.config import RasterConfig, RenderConfig

ON_CHIP = jax.default_backend() != "cpu"
INTERPRET = not ON_CHIP

W = H = 8


def _tiny_scene(diffuse=False):
    """12-tri cube + 1 analytic sphere: both primitive paths, 2 materials."""
    scn = Scene()
    scn.add_mesh("cube", mg.cube())
    scn.add_mesh("ball", mg.uv_sphere(False, 8, 4))
    scn.add_model("c", Model("cube"))
    scn.get_model("c").set_transforms(1.0, 0.0, (0.8, 0.5, 0.0))
    if diffuse:
        scn.get_model("c").set_material(0)
    scn.add_model("g", Model("ball"))
    scn.get_model("g").set_transforms(10.0, 0.0, (0.0, -10.0, 0.0))
    return scn


def _rays(cam, key):
    px, py = pt.pixel_grid(cam.height, cam.width)
    jit = rng.pixel_jitter(key, (px.shape[0],))
    return cam_ops.get_rays(cam, px, py, jit)


def test_megakernel_smoke():
    from ptre_tpu.ops.pallas import megakernel as mk

    pkt = _tiny_scene().build_packet(tri_pad=16)
    cam = cam_ops.Camera.create(width=W, height=H)
    cfg = RenderConfig(width=W, height=H, max_depth=2)
    key = rng.key_for(1)
    o, d = _rays(cam, key)
    img = np.asarray(
        mk.trace_fused(5, o, d, pkt, cfg, key=key, interpret=INTERPRET))
    assert img.shape == (W * H, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # something was lit (sky at minimum)


def test_wavefront_smoke():
    from ptre_tpu.ops.pallas import wavefront as wf

    pkt = _tiny_scene(diffuse=True).build_packet(tri_pad=16)
    cam = cam_ops.Camera.create(width=W, height=H)
    cfg = RenderConfig(width=W, height=H, max_depth=2)
    key = rng.key_for(2)
    o, d = _rays(cam, key)
    culled = np.asarray(wf.trace(key, o, d, pkt, cfg, cull=True,
                                 interpret=INTERPRET, tile_hint=(H, W)))
    assert culled.shape == (W * H, 3)
    assert np.isfinite(culled).all()
    assert culled.max() > 0.05
    if ON_CHIP:  # culled==brute bit-exactness (slow tier covers this on CPU)
        brute = np.asarray(wf.trace(key, o, d, pkt, cfg, cull=False))
        np.testing.assert_allclose(culled, brute, atol=1e-6)


def test_render_kernel_smoke():
    from ptre_tpu.ops.pallas import render_kernel as rk

    W2, H2 = 128, 8  # smallest width the fused sample kernel lanes support
    pkt = _tiny_scene().build_packet(tri_pad=16)
    cam = cam_ops.Camera.create(width=W2, height=H2)
    cfg = RenderConfig(width=W2, height=H2, max_depth=2)
    assert rk.supports(cam, pkt, cfg)
    accum = jnp.zeros((3, H2, W2), jnp.float32)
    # interpret mode has no TPU hardware PRNG — feed external uniforms
    # (the kernel's CPU-parity mode); on chip exercise the hw-PRNG path
    urand = None
    if INTERPRET:
        nrows = 2 + 2 * cfg.max_depth
        urand = jax.random.uniform(rng.key_for(9), (nrows, H2, W2))
    out = np.asarray(rk.sample_accum_fused(
        7, pkt, cam, accum, jnp.float32(1.0), cfg, urand=urand,
        interpret=INTERPRET))
    assert out.shape == (3, H2, W2)
    assert np.isfinite(out).all()
    assert 0.0 <= out.min() and out.max() <= 1.0 and out.max() > 0.05


def test_fused_grad_smoke():
    from ptre_tpu.ops.pallas import fused_grad

    # max_depth=1 keeps the interpret-mode backward body ~30 s on CPU (the
    # multi-bounce backward is pinned by the slow tier + chip runs)
    depth = 3 if ON_CHIP else 1
    pkt = _tiny_scene(diffuse=True).build_packet(tri_pad=16)
    cam = cam_ops.Camera.create(width=W, height=H)
    cfg = RenderConfig(width=W, height=H, max_depth=depth)
    key = rng.key_for(3)
    o, d = _rays(cam, key)

    def loss(alb):
        p = pkt.replace(mat_albedo=alb)
        c = fused_grad.trace_grad(key, o, d, p, cfg, interpret=INTERPRET)
        return jnp.sum(c)

    val, g = jax.value_and_grad(loss)(pkt.mat_albedo)
    assert np.isfinite(float(val))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0  # the diffuse albedo must receive gradient


def _raster_setup(w=128, h=16):
    scn = Scene()
    scn.add_mesh("cube", mg.cube())
    scn.add_model("c", Model("cube"))
    scn.get_model("c").set_transforms(1.0, 0.3, (0.0, 0.5, 0.0))
    pkt = scn.build_packet(tri_pad=16)
    cam = cam_ops.Camera.create(width=w, height=h)
    cfg = RasterConfig(width=w, height=h, supersample=1)
    return pkt, cam, cfg


def test_raster_hard_kernel_smoke():
    from ptre_tpu.ops.pallas import raster_kernel

    pkt, cam, cfg = _raster_setup()
    got = np.asarray(
        raster_kernel.rasterize_fused(pkt, cam, cfg, interpret=INTERPRET))
    assert got.shape == (cfg.height, cfg.width, 3)
    assert np.isfinite(got).all()
    # the cube must cover some pixels with non-clear color
    clear = np.asarray(cfg.clear_color, np.float32)
    covered = np.mean(np.any(np.abs(got - clear) > 1e-3, axis=-1))
    assert 0.01 < covered < 0.9, covered
    if ON_CHIP:  # parity vs XLA (slow tier covers this in interpret mode)
        ref = np.asarray(ras.rasterize(pkt, cam, cfg, backend="xla"))
        mismatch = np.mean(np.any(np.abs(got - ref) > 1e-4, axis=-1))
        assert mismatch < 0.02, f"{mismatch:.4f} of pixels differ from XLA"


def test_raster_soft_kernel_smoke():
    from ptre_tpu.ops.pallas import soft_raster

    pkt, cam, cfg = _raster_setup()
    got = np.asarray(
        soft_raster.rasterize_soft_fused(pkt, cam, cfg, sigma=0.5,
                                         interpret=INTERPRET))
    assert got.shape == (cfg.height, cfg.width, 3)
    assert np.isfinite(got).all()
    clear = np.asarray(cfg.clear_color, np.float32)
    covered = np.mean(np.any(np.abs(got - clear) > 1e-3, axis=-1))
    assert 0.01 < covered < 0.9, covered
    if ON_CHIP:
        ref = np.asarray(ras.rasterize(pkt, cam, cfg, soft=True, sigma=0.5,
                                       backend="xla"))
        np.testing.assert_allclose(got, ref, atol=5e-4)


@pytest.mark.skipif(
    not ON_CHIP,
    reason="soft backward kernel needs ~3 min in CPU interpret mode; its "
    "CPU parity lives in the slow tier "
    "(test_soft_kernel_matches_xla_values_and_gradients)")
def test_raster_soft_kernel_backward_smoke():
    from ptre_tpu.ops.pallas import soft_raster

    pkt, cam, cfg = _raster_setup()

    def loss(tf):
        p = pkt.replace(transforms=tf)
        img = soft_raster.rasterize_soft_fused(p, cam, cfg, sigma=0.5,
                                               interpret=INTERPRET)
        return jnp.mean(img)

    val, g = jax.value_and_grad(loss)(pkt.transforms)
    assert np.isfinite(float(val))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0
