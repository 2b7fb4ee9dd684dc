"""Demo scenes.

The reference builds one hard-coded demo scene at startup
(`application.cu:25-34`): meshes "default" (tri), "cube", "sphere"
(uv_sphere(false, 128, 64), SPHERES type); models "ground" (sphere scaled 10,
rotated pi/2 about x, at (0,-10,0)), "sph" (sphere scaled 0.5 at (0,0.5,0)),
"wall" (cube at (1,0.5,0)). Sphere models path-trace analytically with radius
= scale.x, center = translation; the cube's 12 triangles take the mesh path.
"""

from __future__ import annotations

import math

from ptre_tpu.models import mesh as mesh_gen
from ptre_tpu.models.scene import Model, Scene


def reference_demo_scene(sphere_segments: int = 128, sphere_rings: int = 64) -> Scene:
    """The exact reference demo scene (`application.cu:25-34`)."""
    scn = Scene()
    scn.add_mesh("default", mesh_gen.tri())
    scn.add_mesh("cube", mesh_gen.cube())
    scn.add_mesh("sphere", mesh_gen.uv_sphere(False, sphere_segments, sphere_rings))

    scn.add_model("ground", Model("sphere"))
    scn.get_model("ground").set_transforms(
        10.0, (math.pi / 2.0, 0.0, 0.0), (0.0, -10.0, 0.0)
    )
    scn.add_model("sph", Model("sphere"))
    scn.get_model("sph").set_transforms(0.5, 0.0, (0.0, 0.5, 0.0))
    scn.add_model("wall", Model("cube"))
    scn.get_model("wall").set_transforms(1.0, 0.0, (1.0, 0.5, 0.0))
    return scn


def sphere_light_scene() -> Scene:
    """BASELINE config 1: one analytic sphere + emissive quad light."""
    scn = Scene()
    scn.add_mesh("sphere", mesh_gen.uv_sphere(False, 16, 8))
    scn.add_mesh("light", mesh_gen.quad())

    scn.add_model("ball", Model("sphere"))
    scn.get_model("ball").set_transforms(1.0, 0.0, (0.0, 0.5, 1.0))
    scn.add_model("lamp", Model("light"))
    scn.get_model("lamp").set_transforms(
        2.0, (math.pi / 2.0, 0.0, 0.0), (0.0, 3.0, 1.0)
    )
    return scn


def cornell_spheres_scene() -> Scene:
    """BASELINE config 2: multi-sphere Cornell-style box from analytic spheres."""
    scn = Scene()
    scn.add_mesh("sphere", mesh_gen.uv_sphere(False, 16, 8))
    scn.add_mesh("light", mesh_gen.quad())
    scn.add_mesh("wall", mesh_gen.quad())

    # huge spheres as walls/floor (classic smallpt trick)
    for name, r, pos in [
        ("floor", 1000.0, (0.0, -1000.0, 0.0)),
        ("left", 1000.0, (-1003.0, 1.0, 0.0)),
        ("right", 1000.0, (1003.0, 1.0, 0.0)),
        ("back", 1000.0, (0.0, 1.0, 1004.0)),
    ]:
        scn.add_model(name, Model("sphere"))
        scn.get_model(name).set_transforms(r, 0.0, pos)
    for name, r, pos in [
        ("ball_a", 0.7, (-1.0, 0.7, 1.0)),
        ("ball_b", 0.5, (0.9, 0.5, 0.2)),
    ]:
        scn.add_model(name, Model("sphere"))
        scn.get_model(name).set_transforms(r, 0.0, pos)
    scn.add_model("lamp", Model("light"))
    scn.get_model("lamp").set_transforms(
        2.0, (math.pi / 2.0, 0.0, 0.0), (0.0, 4.0, 0.5)
    )
    return scn
