"""Pallas sweep kernel vs XLA reference sweep (interpret mode on CPU)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from ptre_tpu.models import demo, mesh as mg
from ptre_tpu.models.scene import Model, Scene
from ptre_tpu.ops import camera as cam_ops, intersect as it
from ptre_tpu.ops.pallas import intersect_kernel as pk
from ptre_tpu.render import pathtracer as pt

# slow tier: interpret-mode Pallas sweep kernel (run with `pytest -m slow`)
pytestmark = pytest.mark.slow


def _rays_for(scene_cam, n=None):
    cam = scene_cam
    px, py = pt.pixel_grid(cam.height, cam.width)
    o, d = cam_ops.get_rays(cam, px, py, jnp.zeros((px.shape[0], 2)))
    return o, d


def _compare_scene(scn, w=16, h=16, cam_kw=None):
    pkt = scn.build_packet(tri_pad=8, sph_pad=4)
    cam = cam_ops.Camera.create(width=w, height=h, **(cam_kw or {}))
    o, d = _rays_for(cam)
    wt = pkt.world_triangles()

    ref = it.sweep(o, d, pkt, wt, 1e-6, 999.99)
    got = pk.sweep(o, d, pkt, wt, 1e-6, 999.99, interpret=True)

    r_i_tri, r_hit_tri, r_i_sph, r_hit_sph = (np.asarray(x) for x in ref)
    g_i_tri, g_hit_tri, g_i_sph, g_hit_sph = (np.asarray(x) for x in got)

    np.testing.assert_array_equal(g_hit_tri, r_hit_tri)
    np.testing.assert_array_equal(g_hit_sph, r_hit_sph)
    # indices only matter where the corresponding hit is set
    np.testing.assert_array_equal(g_i_tri[r_hit_tri], r_i_tri[r_hit_tri])
    np.testing.assert_array_equal(g_i_sph[r_hit_sph], r_i_sph[r_hit_sph])


def test_demo_scene_matches_xla():
    _compare_scene(demo.reference_demo_scene(8, 4))


def test_triangle_only_scene():
    scn = Scene()
    scn.add_mesh("cube", mg.cube())
    scn.add_model("a", Model("cube"))
    scn.add_model("b", Model("cube"))
    scn.get_model("b").set_transforms(1.0, (0.3, 0.2, 0.0), (0.5, 0.0, 2.0))
    _compare_scene(scn)


def test_sphere_only_scene():
    scn = Scene()
    scn.add_mesh("s", mg.uv_sphere(False, 4, 3))
    for i in range(5):
        scn.add_model(f"m{i}", Model("s"))
        scn.get_model(f"m{i}").set_transforms(
            0.3 + 0.1 * i, 0.0, (i - 2.0, 0.0, 1.0 + 0.5 * i)
        )
    _compare_scene(scn)


def test_many_triangles_multi_tile():
    # > TILE_P triangles to exercise the inner tile loop
    scn = Scene()
    scn.add_mesh("ball", mg.uv_sphere(False, 24, 12, mg.MeshType.TRIANGLES))
    scn.add_model("m", Model("ball"))
    scn.get_model("m").set_transforms(1.0, 0.0, (0.0, 0.0, 2.0))
    assert scn.get_mesh("ball").num_triangles > pk.TILE_P
    _compare_scene(scn)


def test_integrator_with_pallas_backend_matches_xla():
    from ptre_tpu.ops import integrator, rng
    from ptre_tpu.utils.config import RenderConfig

    scn = demo.reference_demo_scene(8, 4)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=16, height=16)
    o, d = _rays_for(cam)
    key = rng.key_for(5)

    cfg_x = RenderConfig(width=16, height=16, intersect_backend="xla")
    c_xla = integrator.trace(key, o, d, pkt, cfg_x)

    # interpret-mode pallas via monkeypatched selector
    import ptre_tpu.ops.integrator as integ

    orig = integ._select_sweep
    try:
        integ._select_sweep = lambda cfg: functools.partial(pk.sweep, interpret=True)
        cfg_p = RenderConfig(width=16, height=16, intersect_backend="pallas")
        c_pal = integrator.trace(key, o, d, pkt, cfg_p)
    finally:
        integ._select_sweep = orig

    np.testing.assert_allclose(np.asarray(c_xla), np.asarray(c_pal), atol=1e-5)
