"""Fully-fused gradient path (`ops.pallas.fused_grad`) vs the XLA replay.

The fused path's forward is the recording megakernel and its backward is a
single Pallas kernel (in-kernel gather + chain vjp + table scatter); the XLA
replay computes the same quantities with jax.grad through
`ops.path_replay.replay`. In interpret mode both must agree to float
tolerance — values and every parameter gradient — for BOTH forward kernels:
the dense serial-sweep (demo-class scenes) and the culled lane-parallel
(triangle scenes, BASELINE configs 3-4).

Test economy note: ONE interpret-mode backward-kernel execution costs
minutes on CPU (op-by-op dispatch × grid blocks), so scenes are sized to a
single kernel block and each scenario runs exactly one fused backward,
with params AND rays differentiated jointly in that single vjp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptre_tpu.models import demo
from ptre_tpu.models import mesh as mg
from ptre_tpu.models.scene import Material, MaterialKind, Model, Scene
from ptre_tpu.ops import camera as cam_ops, path_replay, rng
from ptre_tpu.ops.pallas import fused_grad, megakernel as mk
from ptre_tpu.parallel import sharding as sh
from ptre_tpu.render import pathtracer as pt
from ptre_tpu.utils.config import RenderConfig

# slow tier: interpret-mode fused-gradient kernels (run with `pytest -m slow`)
pytestmark = pytest.mark.slow


def _demo_setup(w=16, h=8, depth=2):
    scn = demo.reference_demo_scene(12, 6)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=w, height=h)
    cfg = RenderConfig(width=w, height=h, max_depth=depth)
    px, py = pt.pixel_grid(h, w)
    key = rng.key_for(1984)
    jitter = rng.pixel_jitter(rng.fold(key, 0x9E37), (px.shape[0],))
    o, d = cam_ops.get_rays(cam, px, py, jitter)
    return pkt, cam, o, d, key, cfg


def _tri_setup(w=12, h=8):
    """Small mixed sphere+mesh scene routed to the lane-parallel kernel
    (kept tiny: interpret-mode kernels execute per-op per-block on CPU)."""
    scn = Scene()
    scn.add_mesh("ball", mg.uv_sphere(False, 8, 4,
                                      mesh_type=mg.MeshType.TRIANGLES))
    scn.add_mesh("ground", mg.uv_sphere(False, 8, 4))
    scn.add_model("b", Model("ball"))
    scn.get_model("b").set_transforms(1.0, 0.0, (0.0, 0.5, 0.0))
    scn.add_model("g", Model("ground"))
    scn.get_model("g").set_transforms(10.0, 0.0, (0.0, -10.0, 0.0))
    # diffuse ball: the reference default (triangles → emissive) has
    # CONSTANT attenuation, so every geometry gradient would be exactly
    # zero by construction — Oren-Nayar makes transform/vertex gradients
    # observable (through the differentiable t/u/v/normal recompute)
    diffuse = scn.add_material(Material(MaterialKind.OREN_NAYAR,
                                        (0.6, 0.5, 0.4), 0.7))
    scn.set_model_material("b", diffuse)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=w, height=h)
    cfg = RenderConfig(width=w, height=h, max_depth=2)
    px, py = pt.pixel_grid(h, w)
    key = rng.key_for(7)
    jitter = rng.pixel_jitter(rng.fold(key, 0x9E37), (px.shape[0],))
    o, d = cam_ops.get_rays(cam, px, py, jitter)
    return pkt, cam, o, d, key, cfg


def _loss_weights(c):
    return jnp.cos(jnp.arange(c.size, dtype=jnp.float32).reshape(c.shape))


def _grads(pkt, cam, o, d, key, cfg, fused, force=None, sel=None, urand=None):
    """value+grads of one scalar loss w.r.t. (params, o, d) in ONE vjp."""
    params = sh.differentiable_params(pkt, cam)

    def loss(par, oo, dd):
        pk, _ = sh._apply_params(par, pkt, cam)
        if fused:
            c = fused_grad.trace_grad(key, oo, dd, pk, cfg, interpret=True,
                                      force=force)
        else:
            c = path_replay.replay(oo, dd, sel, urand, pk, cfg, backend="xla")
        return jnp.sum(c * _loss_weights(c)), c

    (_, c), g = jax.value_and_grad(loss, (0, 1, 2), has_aux=True)(params, o, d)
    return c, g


def _assert_tree_close(ga, gb, rtol, atol):
    pa, oa, da = ga
    pb, ob, db = gb
    for k in pb:
        np.testing.assert_allclose(np.asarray(pa[k]), np.asarray(pb[k]),
                                   rtol=rtol, atol=atol, err_msg=k)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                               rtol=rtol, atol=2 * atol)


def test_fused_dense_matches_xla_replay():
    """Dense forward + fused backward == XLA replay: values AND gradients
    w.r.t. every differentiable param plus the primary rays — one fused
    backward execution covers all of it."""
    pkt, cam, o, d, key, cfg = _demo_setup()
    sel, urand = mk.trace_fused_sel(key, o, d, pkt, cfg, interpret=True)
    c_f, g_f = _grads(pkt, cam, o, d, key, cfg, fused=True, force="dense")
    c_x, g_x = _grads(pkt, cam, o, d, key, cfg, fused=False,
                      sel=sel, urand=urand)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_x),
                               rtol=2e-5, atol=2e-6)
    _assert_tree_close(g_f, g_x, rtol=5e-4, atol=1e-5)


def test_fused_culled_matches_xla_replay_and_cull_invariant():
    """Lane-parallel forward + fused backward: (a) cull=False == the XLA
    replay driven by the kernel's own recorded selections, (b) culling
    (Morton permutation + two-level AABB skip) changes neither color nor
    any gradient. Two fused backward executions total."""
    pkt, cam, o, d, key, cfg = _tri_setup()
    _, sel_p, urand_p, perm = mk.trace_culled_sel(key, o, d, pkt, cfg,
                                                  cull=False, interpret=True)
    assert perm is None
    R = o.shape[0]
    B = cfg.max_depth
    sel = sel_p.reshape(4 * B, -1)[:, :R].reshape(B, 4, R)
    urand = urand_p.reshape(2 * B, -1)[:, :R]

    c_u, g_u = _grads(pkt, cam, o, d, key, cfg, fused=True, force="uncull")
    c_x, g_x = _grads(pkt, cam, o, d, key, cfg, fused=False,
                      sel=sel, urand=urand)
    np.testing.assert_allclose(np.asarray(c_u), np.asarray(c_x),
                               rtol=2e-5, atol=2e-6)
    _assert_tree_close(g_u, g_x, rtol=5e-4, atol=2e-5)

    c_c, g_c = _grads(pkt, cam, o, d, key, cfg, fused=True, force="culled")
    np.testing.assert_allclose(np.asarray(c_c), np.asarray(c_u),
                               rtol=1e-6, atol=1e-7)
    _assert_tree_close(g_c, g_u, rtol=1e-5, atol=1e-7)


def test_fused_culled_fd_transform():
    """FD spot-check of a transform gradient on the triangle scene (the
    BASELINE config-3/4 capability: differentiable triangle-scale scenes).
    One fused backward + two fused forwards."""
    pkt, cam, o, d, key, cfg = _tri_setup(w=8, h=8)

    def f(dy):
        delta = jnp.zeros_like(pkt.transforms)
        delta = delta.at[0, 3, 1].set(dy)  # translate model 0 in y
        p2 = pkt.replace(transforms=pkt.transforms + delta)
        c = fused_grad.trace_grad(key, o, d, p2, cfg, interpret=True,
                                  force="culled")
        return jnp.mean(c)

    g = float(jax.grad(f)(jnp.float32(0.0)))
    eps = 1e-3
    fd = (float(f(jnp.float32(eps))) - float(f(jnp.float32(-eps)))) / (2 * eps)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd, rtol=0.15, atol=2e-3)
    assert abs(g) > 1e-5


def test_trace_routes_through_fused():
    """integrator.trace grad_sweep='fused' routes through the fused path
    (dense here — cheap) and produces finite, nonzero grads."""
    from ptre_tpu.ops import integrator

    pkt, cam, o, d, key, cfg = _demo_setup(w=8, h=8, depth=2)
    cfg = RenderConfig(width=8, height=8, max_depth=2, grad_sweep="fused")
    assert integrator._grad_route(cfg, pkt) == "fused"

    def f(s):
        p2 = pkt.replace(mat_albedo=pkt.mat_albedo * s)
        c = integrator.trace(key, o, d, p2, cfg)
        return jnp.mean(c)

    g = float(jax.grad(f)(jnp.float32(1.0)))
    assert np.isfinite(g) and abs(g) > 1e-6
