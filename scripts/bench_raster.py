"""Rasterizer benchmark: Pallas tile kernel vs XLA reference path on TPU.

Backs the rasterizer claim with a recorded number (VERDICT round 1, weak #8):
prints one JSON line with Mpixels/s for both paths at 720p supersample=2
(the reference 4x-MSAA analogue, `rasterizer.cu:31`).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from ptre_tpu.models import demo
    from ptre_tpu.ops import camera as cam_ops
    from ptre_tpu.render import rasterizer as ras
    from ptre_tpu.utils.config import RasterConfig

    W, H = 1280, 720
    scn = demo.reference_demo_scene(32, 16)
    pkt = scn.build_packet(spheres_as_triangles=True)
    cam = cam_ops.Camera.create(width=W, height=H)
    cfg = RasterConfig(width=W, height=H)

    out = {"size": f"{W}x{H}", "supersample": cfg.supersample,
           "triangles": int(pkt.num_triangles)}

    from ptre_tpu.ops.pallas import raster_kernel

    assert raster_kernel.supports(cfg)
    paths = {
        "pallas": jax.jit(lambda: raster_kernel.rasterize_fused(pkt, cam, cfg)),
        # the XLA hard path, row-chunked so the (samples x triangles)
        # intermediate fits
        "xla": jax.jit(lambda: ras.rasterize(pkt, cam, cfg, row_chunk=96,
                                             backend="xla")),
    }
    for name, fn in paths.items():
        t0 = time.perf_counter()
        img = fn()
        float(img.sum())
        out[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)
        n = 10 if name == "pallas" else 3
        t0 = time.perf_counter()
        for _ in range(n):
            img = fn()
        float(img.sum())
        dt = (time.perf_counter() - t0) / n
        out[f"{name}_ms_per_frame"] = round(dt * 1e3, 2)
        out[f"{name}_mpixels_per_s"] = round(W * H / dt / 1e6, 1)
    out["pallas_speedup"] = round(
        out["pallas_mpixels_per_s"] / out["xla_mpixels_per_s"], 1)

    # differentiable (SoftRas) variant: the gradient-bearing pipeline of
    # BASELINE config 5 — measured at the same frame shape. "soft" = the
    # production Pallas custom-VJP kernel pair (r4); "soft_xla" = the XLA
    # reference path kept for the A/B.
    import jax.numpy as jnp

    for name, fn in (
        ("soft", jax.jit(lambda: ras.rasterize(pkt, cam, cfg, soft=True))),
        ("soft_xla", jax.jit(lambda: ras.rasterize(
            pkt, cam, cfg, soft=True, row_chunk=96, backend="xla"))),
    ):
        t0 = time.perf_counter()
        img = fn()
        float(img.sum())
        out[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        for _ in range(3):
            img = fn()
        float(img.sum())
        dt = (time.perf_counter() - t0) / 3
        out[f"{name}_ms_per_frame"] = round(dt * 1e3, 2)
        out[f"{name}_mpixels_per_s"] = round(W * H / dt / 1e6, 1)

    # soft forward+backward (the dual-train gradient shape)
    tgt = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def loss(tr):
        p2 = pkt.replace(transforms=tr)
        return jnp.mean((ras.rasterize(p2, cam, cfg, soft=True) - tgt) ** 2)

    g = jax.jit(jax.value_and_grad(loss))
    t0 = time.perf_counter()
    v, gr = g(pkt.transforms)
    float(gr.sum())
    out["soft_fwdbwd_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    for _ in range(3):
        v, gr = g(pkt.transforms)
    float(gr.sum())
    out["soft_fwdbwd_ms_per_frame"] = round(
        (time.perf_counter() - t0) / 3 * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
