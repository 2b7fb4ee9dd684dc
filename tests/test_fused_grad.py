"""Fully-fused gradient path (`ops.pallas.fused_grad`) vs the XLA replay.

The fused path's forward is the recording megakernel and its backward is a
single Pallas kernel (in-kernel gather + chain vjp + table scatter); the XLA
replay computes the same quantities with jax.grad through
`ops.path_replay.replay`. In interpret mode both must agree to float
tolerance — values and every parameter gradient — for BOTH forward kernels:
the dense serial-sweep (demo-class scenes) and the culled lane-parallel
(triangle scenes, BASELINE configs 3-4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ptre_tpu.models import demo
from ptre_tpu.models import mesh as mg
from ptre_tpu.models.scene import Model, Scene
from ptre_tpu.ops import camera as cam_ops, path_replay, rng
from ptre_tpu.ops.pallas import fused_grad, megakernel as mk
from ptre_tpu.parallel import sharding as sh
from ptre_tpu.render import pathtracer as pt
from ptre_tpu.utils.config import RenderConfig


def _demo_setup(w=24, h=16):
    scn = demo.reference_demo_scene(12, 6)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=w, height=h)
    cfg = RenderConfig(width=w, height=h)
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


def test_fused_dense_matches_xla_replay():
    """Dense forward + fused backward == XLA replay, values and grads."""
    pkt, cam, o, d, key, cfg = _demo_setup()
    sel, urand = mk.trace_fused_sel(key, o, d, pkt, cfg, interpret=True)
    params = sh.differentiable_params(pkt, cam)

    def loss_fused(par):
        pk, _ = sh._apply_params(par, pkt, cam)
        c = fused_grad.trace_grad(key, o, d, pk, cfg, interpret=True,
                                  force="dense")
        return jnp.sum(c * _loss_weights(c)), c

    def loss_xla(par):
        pk, _ = sh._apply_params(par, pkt, cam)
        c = path_replay.replay(o, d, sel, urand, pk, cfg, backend="xla")
        return jnp.sum(c * _loss_weights(c)), c

    (_, c_f), g_f = jax.value_and_grad(loss_fused, has_aux=True)(params)
    (_, c_x), g_x = jax.value_and_grad(loss_xla, has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_x),
                               rtol=2e-5, atol=2e-6)
    for k in g_x:
        np.testing.assert_allclose(
            np.asarray(g_f[k]), np.asarray(g_x[k]),
            rtol=5e-4, atol=5e-6, err_msg=k)


def test_fused_dense_ray_grads():
    """Camera-ray gradients flow through the planar rays packing."""
    pkt, cam, o, d, key, cfg = _demo_setup()
    sel, urand = mk.trace_fused_sel(key, o, d, pkt, cfg, interpret=True)

    def loss(oo, dd, fused):
        if fused:
            c = fused_grad.trace_grad(key, oo, dd, pkt, cfg, interpret=True,
                                      force="dense")
        else:
            c = path_replay.replay(oo, dd, sel, urand, pkt, cfg,
                                   backend="xla")
        return jnp.sum(c * _loss_weights(c))

    go_f, gd_f = jax.grad(lambda a, b: loss(a, b, True), (0, 1))(o, d)
    go_x, gd_x = jax.grad(lambda a, b: loss(a, b, False), (0, 1))(o, d)
    np.testing.assert_allclose(np.asarray(go_f), np.asarray(go_x),
                               rtol=5e-4, atol=5e-6)
    np.testing.assert_allclose(np.asarray(gd_f), np.asarray(gd_x),
                               rtol=5e-4, atol=1e-5)


def test_fused_culled_uncull_matches_xla_replay():
    """Lane-parallel (cull=False) forward + fused backward == XLA replay
    driven by the kernel's own recorded selections."""
    pkt, cam, o, d, key, cfg = _tri_setup()
    _, sel_p, urand_p, perm = mk.trace_culled_sel(key, o, d, pkt, cfg,
                                                  cull=False, interpret=True)
    assert perm is None
    R = o.shape[0]
    B = cfg.max_depth
    sel = sel_p.reshape(4 * B, -1)[:, :R].reshape(B, 4, R)
    urand = urand_p.reshape(2 * B, -1)[:, :R]
    params = sh.differentiable_params(pkt, cam)

    def loss_fused(par):
        pk, _ = sh._apply_params(par, pkt, cam)
        c = fused_grad.trace_grad(key, o, d, pk, cfg, interpret=True,
                                  force="culled")
        return jnp.sum(c * _loss_weights(c)), c

    def loss_xla(par):
        pk, _ = sh._apply_params(par, pkt, cam)
        c = path_replay.replay(o, d, sel, urand, pk, cfg, backend="xla")
        return jnp.sum(c * _loss_weights(c)), c

    (_, c_f), g_f = jax.value_and_grad(loss_fused, has_aux=True)(params)
    (_, c_x), g_x = jax.value_and_grad(loss_xla, has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_x),
                               rtol=2e-5, atol=2e-6)
    for k in g_x:
        np.testing.assert_allclose(
            np.asarray(g_f[k]), np.asarray(g_x[k]),
            rtol=5e-4, atol=1e-5, err_msg=k)


def test_fused_culled_perm_invariance():
    """Culling (Morton permutation + AABB tile skip) changes neither the
    color nor any parameter gradient — winners are winners."""
    pkt, cam, o, d, key, cfg = _tri_setup()

    def run(cull):
        def loss(par):
            pk, _ = sh._apply_params(par, pkt, cam)
            sg = jax.lax.stop_gradient
            pkt_d = jax.tree.map(sg, pk)
            color, sel_p, urand_p, perm = mk.trace_culled_sel(
                key, sg(o), sg(d), pkt_d, cfg, cull=cull, interpret=True)
            table, T, sky6 = path_replay._build_table(pk)
            if perm is not None:
                table = jnp.concatenate([table[:T][perm], table[T:]], axis=0)
            Ltot = sel_p.shape[2]
            rays_p = fused_grad._pack_rays_planar(o, d, Ltot)
            core = fused_grad._make_core(
                cfg.max_depth, float(cfg.t_min), float(cfg.shadow_eps),
                float(cfg.pdf_eps), int(T), int(o.shape[0]),
                128 if Ltot % 128 == 0 else Ltot, True)
            c = core(table, sky6, rays_p, sel_p, urand_p, color)
            return jnp.sum(c * _loss_weights(c)), c

        return jax.value_and_grad(loss, has_aux=True)(
            sh.differentiable_params(pkt, cam))

    (_, c_n), g_n = run(False)
    (_, c_c), g_c = run(True)
    np.testing.assert_allclose(np.asarray(c_c), np.asarray(c_n),
                               rtol=1e-6, atol=1e-7)
    for k in g_n:
        np.testing.assert_allclose(
            np.asarray(g_c[k]), np.asarray(g_n[k]),
            rtol=1e-5, atol=1e-7, err_msg=k)


def test_fused_culled_fd_transform():
    """FD spot-check of a transform gradient on the triangle scene (the
    BASELINE config-3/4 capability: differentiable triangle-scale scenes)."""
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


def test_trace_routes_through_fused(monkeypatch):
    """integrator.trace grad_sweep='fused' uses the fused path for both
    dense and triangle scenes (and produces finite grads)."""
    from ptre_tpu.ops import integrator

    pkt, cam, o, d, key, cfg = _tri_setup(w=8, h=8)
    cfg = RenderConfig(width=8, height=8, max_depth=2, grad_sweep="fused")
    assert integrator._grad_route(cfg, pkt) == "fused"

    def f(s):
        p2 = pkt.replace(mat_albedo=pkt.mat_albedo * s)
        c = integrator.trace(key, o, d, p2, cfg)
        return jnp.mean(c)

    g = float(jax.grad(f)(jnp.float32(1.0)))
    assert np.isfinite(g) and abs(g) > 1e-6
