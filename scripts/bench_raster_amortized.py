"""Amortized rasterizer cadence: K frames per dispatch vs the vsync budget.

Round-4 VERDICT directive #3: the single-frame 18-21 ms at 720p ss=2 is
dominated by a fixed per-invocation floor of the tunneled platform (the r4
ablation measured ~14.6 ms with an EMPTY kernel body, grid-size invariant)
— while the marginal frame cost is ~3.7 ms. The reference presents at
vsync (`Present(1,0)`, `rasterizer.cu:149`, 16.7 ms); the engine meets
that cadence when the floor is shared across frames, which is exactly the
CLI frame-sequence use case. `render.rasterizer.rasterize_frames` renders
K frames in ONE dispatch (lax.scan over per-frame transform sets — a real
animation: the cube spins); this script records ms/frame at K in
{1, 4, 16} alongside the single-frame number.

Writes docs/artifacts/RASTER_AMORTIZED.json and prints one JSON line.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ptre_tpu.models import demo
    from ptre_tpu.ops import camera as cam_ops, vecmat as vm
    from ptre_tpu.render import rasterizer as ras
    from ptre_tpu.utils.config import RasterConfig

    W, H = 1280, 720
    scn = demo.reference_demo_scene(32, 16)
    pkt = scn.build_packet(spheres_as_triangles=True)
    cam = cam_ops.Camera.create(width=W, height=H)
    cfg = RasterConfig(width=W, height=H)

    out = {"size": f"{W}x{H}", "supersample": cfg.supersample,
           "triangles": int(pkt.num_triangles),
           "vsync_budget_ms": 16.7}

    base_tf = np.asarray(pkt.transforms)

    def spin_transforms(k_frames, phase):
        """(K, D, 4, 4): the demo scene with its cube model spun by
        0.02 rad/frame — a real per-frame animation, and distinct inputs
        per timing iteration so the tunnel cannot serve cached results.
        Pure host-side numpy: no device round-trips inside timed loops."""
        frames = []
        for f in range(k_frames):
            tf = base_tf.copy()
            ang = 0.02 * (phase * k_frames + f)
            c, s = math.cos(ang), math.sin(ang)
            # row-vector rotation_y convention (ops/vecmat.py)
            rot = np.array([[c, 0.0, -s, 0.0], [0.0, 1.0, 0.0, 0.0],
                            [s, 0.0, c, 0.0], [0.0, 0.0, 0.0, 1.0]],
                           np.float32)
            tf[-1] = rot @ tf[-1]
            frames.append(tf)
        return jnp.asarray(np.stack(frames), jnp.float32)

    # single-frame reference (same spin, K dispatches)
    single = jax.jit(
        lambda tr: ras.rasterize(pkt.replace(transforms=tr), cam, cfg))
    t0 = time.perf_counter()
    img = single(spin_transforms(1, 0)[0])
    float(img.sum())
    out["single_compile_s"] = round(time.perf_counter() - t0, 1)
    n = 12
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        img = single(spin_transforms(1, i)[0])
    float(img.sum())
    out["k1_ms_per_frame"] = round((time.perf_counter() - t0) / n * 1e3, 2)

    for K in (4, 16):
        t0 = time.perf_counter()
        imgs = ras.rasterize_frames(pkt, cam, spin_transforms(K, 0), cfg)
        float(imgs.sum())
        out[f"k{K}_compile_s"] = round(time.perf_counter() - t0, 1)
        reps = max(1, 48 // K)
        t0 = time.perf_counter()
        for i in range(1, reps + 1):
            imgs = ras.rasterize_frames(pkt, cam, spin_transforms(K, i), cfg)
        float(imgs.sum())
        dt = (time.perf_counter() - t0) / (reps * K)
        out[f"k{K}_ms_per_frame"] = round(dt * 1e3, 2)
        out[f"k{K}_mpixels_per_s"] = round(W * H / dt / 1e6, 1)

    out["meets_vsync_at_k4"] = out["k4_ms_per_frame"] <= out["vsync_budget_ms"]
    out["meets_vsync_at_k16"] = (
        out["k16_ms_per_frame"] <= out["vsync_budget_ms"])

    # the same amortized cadence without supersampling (the reference's
    # MSAA analogue off): the remaining per-frame cost is real sweep work,
    # so ss=1's 4x-smaller pixel grid shows the vsync-met operating point
    cfg1 = RasterConfig(width=W, height=H, supersample=1)
    imgs = ras.rasterize_frames(pkt, cam, spin_transforms(4, 0), cfg1)
    float(imgs.sum())
    reps = 12
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        imgs = ras.rasterize_frames(pkt, cam, spin_transforms(4, i), cfg1)
    float(imgs.sum())
    dt = (time.perf_counter() - t0) / (reps * 4)
    out["k4_ss1_ms_per_frame"] = round(dt * 1e3, 2)
    out["meets_vsync_at_k4_ss1"] = (
        out["k4_ss1_ms_per_frame"] <= out["vsync_budget_ms"])

    os.makedirs("docs/artifacts", exist_ok=True)
    with open("docs/artifacts/RASTER_AMORTIZED.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
