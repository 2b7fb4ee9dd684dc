"""Pallas replay core (fwd + custom-VJP bwd) vs the XLA replay.

The kernel chain mirrors `ops.path_replay`'s formulas exactly, so in
interpret mode (CPU) both the forward colors and every gradient must agree
to float tolerance. Gradients are compared leaf-by-leaf through the same
`differentiable_params` pytree the train step uses — this pins the whole
route: params → table/rays → Pallas kernels → dg/drays/dsky → transpose
matmuls → parameter gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ptre_tpu.models import demo
from ptre_tpu.ops import camera as cam_ops, path_replay, rng
from ptre_tpu.ops.pallas import megakernel as mk
from ptre_tpu.parallel import sharding as sh
from ptre_tpu.render import pathtracer as pt
from ptre_tpu.utils.config import RenderConfig
import pytest

# slow tier: interpret-mode replay chain kernel (run with `pytest -m slow`)
pytestmark = pytest.mark.slow


def _setup(w=24, h=16):
    scn = demo.reference_demo_scene(12, 6)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=w, height=h)
    cfg = RenderConfig(width=w, height=h)
    px, py = pt.pixel_grid(h, w)
    key = rng.key_for(1984)
    jitter = rng.pixel_jitter(rng.fold(key, 0x9E37), (px.shape[0],))
    o, d = cam_ops.get_rays(cam, px, py, jitter)
    sel, urand = mk.trace_fused_sel(key, o, d, pkt, cfg, interpret=True)
    return pkt, cam, o, d, sel, urand, cfg


def test_pallas_replay_forward_matches_xla():
    pkt, _, o, d, sel, urand, cfg = _setup()
    c_xla = path_replay.replay(o, d, sel, urand, pkt, cfg, backend="xla")
    c_pal = path_replay.replay(o, d, sel, urand, pkt, cfg,
                               backend="pallas-interpret")
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_xla),
                               rtol=2e-5, atol=2e-6)


def test_pallas_replay_grads_match_xla():
    pkt, cam, o, d, sel, urand, cfg = _setup()
    params = sh.differentiable_params(pkt, cam)

    def loss(par, backend):
        pk, cm = sh._apply_params(par, pkt, cam)
        # o, d fixed here: camera-ray grads are pinned separately below
        c = path_replay.replay(o, d, sel, urand, pk, cfg, backend=backend)
        return jnp.sum(c * jnp.cos(jnp.arange(c.size).reshape(c.shape)))

    g_xla = jax.grad(lambda p: loss(p, "xla"))(params)
    g_pal = jax.grad(lambda p: loss(p, "pallas-interpret"))(params)
    for k in g_xla:
        np.testing.assert_allclose(
            np.asarray(g_pal[k]), np.asarray(g_xla[k]),
            rtol=5e-4, atol=5e-6, err_msg=k)


def test_planar_fast_path_matches_xla():
    """Planar sel/urand (kernel-native layout) through the Pallas core ==
    the XLA replay, values and parameter gradients."""
    pkt, cam, o, d, sel, urand, cfg = _setup()
    key = rng.key_for(1984)
    sel_p, urand_p = mk.trace_fused_sel(key, o, d, pkt, cfg, interpret=True,
                                        planar=True)
    params = sh.differentiable_params(pkt, cam)

    def loss_planar(par):
        pk, _ = sh._apply_params(par, pkt, cam)
        table, T, sky6 = path_replay._build_table(pk)
        c = path_replay._replay_pallas_planar(
            o, d, sel_p, urand_p, table, T, sky6, cfg, interpret=True)
        return jnp.sum(c * jnp.cos(jnp.arange(c.size).reshape(c.shape))), c

    def loss_xla(par):
        pk, _ = sh._apply_params(par, pkt, cam)
        c = path_replay.replay(o, d, sel, urand, pk, cfg, backend="xla")
        return jnp.sum(c * jnp.cos(jnp.arange(c.size).reshape(c.shape))), c

    (l_p, c_p), g_p = jax.value_and_grad(loss_planar, has_aux=True)(params)
    (l_x, c_x), g_x = jax.value_and_grad(loss_xla, has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x),
                               rtol=2e-5, atol=2e-6)
    for k in g_x:
        np.testing.assert_allclose(
            np.asarray(g_p[k]), np.asarray(g_x[k]),
            rtol=5e-4, atol=5e-6, err_msg=k)


def test_pallas_replay_ray_grads_match_xla():
    pkt, _, o, d, sel, urand, cfg = _setup()

    def loss(oo, dd, backend):
        c = path_replay.replay(oo, dd, sel, urand, pkt, cfg, backend=backend)
        return jnp.sum(c * jnp.sin(1.0 + jnp.arange(c.size).reshape(c.shape)))

    go_x, gd_x = jax.grad(lambda a, b: loss(a, b, "xla"), (0, 1))(o, d)
    go_p, gd_p = jax.grad(
        lambda a, b: loss(a, b, "pallas-interpret"), (0, 1))(o, d)
    np.testing.assert_allclose(np.asarray(go_p), np.asarray(go_x),
                               rtol=5e-4, atol=5e-6)
    np.testing.assert_allclose(np.asarray(gd_p), np.asarray(gd_x),
                               rtol=5e-4, atol=1e-5)
