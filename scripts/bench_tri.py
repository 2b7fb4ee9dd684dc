"""Triangle-heavy scene benchmark: BASELINE config 3 + stress scene.

Measures the culled lane-parallel megakernel against its brute-force mode
(`cull=False`) — quantifying the Morton/AABB tile culling, the TPU-native
answer to the reference's known scaling cliff (`path_tracer.cu:263-282`,
README "BVH acceleration" TODO).

Usage: python scripts/bench_tri.py [--stress]
Prints one JSON line per config with culled/brute Mrays/s.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_scene(name, seg, rings, W, H, steps=6):
    import jax

    from ptre_tpu.models import mesh as mg
    from ptre_tpu.models.scene import Model, Scene
    from ptre_tpu.ops import camera as cam_ops, rng
    from ptre_tpu.ops.pallas import megakernel as mk
    from ptre_tpu.render import pathtracer as pt
    from ptre_tpu.utils.config import RenderConfig

    scn = Scene()
    # uv_sphere forced TRIANGLES: the reference's worst case (it declares
    # uv_sphere SPHERES by default precisely to dodge this cost)
    scn.add_mesh("ball", mg.uv_sphere(False, seg, rings,
                                      mesh_type=mg.MeshType.TRIANGLES))
    scn.add_mesh("ground", mg.uv_sphere(False, 16, 8))
    scn.add_model("b", Model("ball"))
    scn.get_model("b").set_transforms(1.0, 0.0, (0.0, 0.5, 0.0))
    scn.add_model("g", Model("ground"))
    scn.get_model("g").set_transforms(10.0, 0.0, (0.0, -10.0, 0.0))
    pkt = scn.build_packet(tri_pad=512)
    n_tri = int(pkt.num_triangles)
    assert mk.supports(pkt), (n_tri, "exceeds fused budget")

    cam = cam_ops.Camera.create(width=W, height=H)
    cfg = RenderConfig(width=W, height=H)
    key = rng.key_for(1984)
    px, py = pt.pixel_grid(H, W)
    jit = rng.pixel_jitter(key, (px.shape[0],))
    o, d = cam_ops.get_rays(cam, px, py, jit)
    o = jax.block_until_ready(o)

    out = {"scene": name, "triangles": n_tri, "size": f"{W}x{H}"}
    for mode, cull in (("culled", True), ("brute", False)):
        fn = jax.jit(lambda s, c=cull: mk.trace_fused(s, o, d, pkt, cfg, cull=c))
        t0 = time.perf_counter()
        r = fn(0)
        float(r.sum())
        out[f"{mode}_compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        for i in range(1, steps + 1):
            r = fn(i)
        float(r.sum())
        dt = (time.perf_counter() - t0) / steps
        out[f"{mode}_mrays_per_s"] = round(W * H * cfg.max_depth / dt / 1e6, 1)
        out[f"{mode}_ms_per_sample"] = round(dt * 1e3, 1)
    out["cull_speedup"] = round(
        out["culled_mrays_per_s"] / out["brute_mrays_per_s"], 2)
    print(json.dumps(out), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stress", action="store_true",
                   help="also run the ~32k-tri stress scene")
    p.add_argument("--skip-config3", action="store_true")
    args = p.parse_args()
    if not args.skip_config3:
        # BASELINE config 3: 512x512, uv_sphere(128, 64) as TRIANGLES ≈ 16k
        bench_scene("config3_uv128x64", 128, 64, 512, 512)
    if args.stress:
        # ~31.5k triangles — near the fused VMEM budget
        bench_scene("stress_uv256x62", 256, 62, 512, 512)


if __name__ == "__main__":
    main()
