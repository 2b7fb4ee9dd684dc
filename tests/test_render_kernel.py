"""Whole-sample fused render kernel vs the staged composition.

`render_kernel.sample_accum_fused` must reproduce, in one dispatch, exactly:
jittered ray gen (`camera.cu:20-43`) → megakernel bounce loop → per-sample
clamp + NaN scrub (`path_tracer.cu:345-353`) → running-average accumulation
(`path_tracer.cu:356-358`). With the same external uniforms it must match the
composed pipeline to float tolerance (interpret mode; CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptre_tpu.models import demo
from ptre_tpu.ops import camera as cam_ops, integrator, rng
from ptre_tpu.ops.pallas import megakernel, render_kernel
from ptre_tpu.render import pathtracer as pt
from ptre_tpu.utils.config import RenderConfig

# slow tier: interpret-mode whole-sample render kernel (run with `pytest -m slow`)
pytestmark = pytest.mark.slow

W, H = 128, 8


@pytest.fixture(scope="module")
def setup():
    scn = demo.reference_demo_scene(8, 4)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=W, height=H)
    cfg = RenderConfig(width=W, height=H, max_depth=3)
    return pkt, cam, cfg


def _urand_rows(key, jkey, cfg):
    """Uniform rows laid out as the kernel expects: jitter x/y then the
    per-bounce scatter draws, built with trace_fused's exact key schedule."""
    R = W * H
    jx = jax.random.uniform(jax.random.fold_in(jkey, 0), (R,), jnp.float32)
    jy = jax.random.uniform(jax.random.fold_in(jkey, 1), (R,), jnp.float32)
    rows = [jx, jy]
    for b in range(cfg.max_depth):
        bkey = rng.fold(key, b)
        k1, k2 = jax.random.split(bkey)
        rows.append(jax.random.uniform(k1, (R,), jnp.float32))
        rows.append(jax.random.uniform(k2, (R,), jnp.float32))
    return jnp.stack(rows).reshape(len(rows), H, W)


def test_supports(setup):
    pkt, cam, cfg = setup
    assert render_kernel.supports(cam, pkt, cfg)
    cam_odd = cam_ops.Camera.create(width=100, height=16)
    assert not render_kernel.supports(cam_odd, pkt, cfg)


def test_fused_sample_matches_staged_composition(setup):
    pkt, cam, cfg = setup
    key = rng.key_for(7)
    jkey = rng.fold(key, 99)
    urand = _urand_rows(key, jkey, cfg)

    # staged: rays with the same jitter -> trace_fused external -> post+accum
    px, py = pt.pixel_grid(H, W)
    jitter = jnp.stack(
        [urand[0].reshape(-1) - 0.5, urand[1].reshape(-1) - 0.5], axis=-1
    )
    o, d = cam_ops.get_rays(cam, px, py, jitter)
    color = megakernel.trace_fused(0, o, d, pkt, cfg, key=key, interpret=True)
    color = integrator.postprocess_sample(color, cfg.clamp_samples)

    prev = jnp.linspace(0.0, 1.0, 3 * H * W, dtype=jnp.float32).reshape(3, H, W)
    n = 3.0
    expected = (
        color.T.reshape(3, H, W) / n + prev * (n - 1.0) / n
    )

    got = render_kernel.sample_accum_fused(
        0, pkt, cam, prev, n, cfg, urand=urand, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_fused_sample_accumulates_from_zero(setup):
    pkt, cam, cfg = setup
    key = rng.key_for(3)
    urand = _urand_rows(key, rng.fold(key, 1), cfg)
    accum0 = jnp.zeros((3, H, W), jnp.float32)
    out1 = render_kernel.sample_accum_fused(
        0, pkt, cam, accum0, 1.0, cfg, urand=urand, interpret=True
    )
    a = np.asarray(out1)
    assert np.all(np.isfinite(a)) and a.min() >= 0.0 and a.max() <= 1.0
    # sky pixels at the top of the frame converge to the gradient instantly
    assert a.max() > 0.05
