"""Benchmark: path-tracing throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mrays/s of the progressive path tracer on the reference demo scene at
1080p (BASELINE.json "Mrays/s/chip ... at 1080p"). A "ray" is one traced
bounce segment: the fixed-depth masked scan evaluates max_depth (5) segments
per sample path, matching the reference's per-thread bounce loop
(`path_tracer.cu:252`).

vs_baseline: the reference publishes no numbers (BASELINE.md). Its duty
cycle implies an upper bound of 1280*720*1spp per 0.1 s kernel cadence x 5
bounces = 46.08 Mrays/s on its CC 7.5 GPU (`path_tracer.cu:378,402`,
`window.h:40-41`); we report our throughput relative to that derived figure.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from ptre_tpu.models import demo
    from ptre_tpu.ops import camera as cam_ops, rng
    from ptre_tpu.render import pathtracer as pt
    from ptre_tpu.utils.config import RenderConfig

    W, H = 1920, 1080
    SPP_PER_STEP = 4
    STEPS = 8

    scn = demo.reference_demo_scene(32, 16)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=W, height=H)
    cfg = RenderConfig(width=W, height=H)
    accum = pt.AccumState.create(H, W)
    key = rng.key_for(cfg.seed)

    # the Pallas sweep never materializes the (rays x primitives) working
    # set, so no chunking on TPU; the XLA fallback (CPU) still chunks
    import jax as _jax

    on_tpu = _jax.default_backend() in ("tpu", "axon")
    ray_chunk = 0 if on_tpu else (W * H) // 8

    # warmup / compile (fetch a scalar: the experimental tunnel platform's
    # block_until_ready does not reliably wait, so force a host readback)
    accum = pt.render_step_jit(pkt, cam, accum, rng.fold(key, 0), cfg,
                               spp=SPP_PER_STEP, ray_chunk=ray_chunk)
    float(accum.linear.sum())

    t0 = time.perf_counter()
    for i in range(1, STEPS + 1):
        accum = pt.render_step_jit(pkt, cam, accum, rng.fold(key, i), cfg,
                                   spp=SPP_PER_STEP, ray_chunk=ray_chunk)
    float(accum.linear.sum())  # host readback = hard sync
    dt = time.perf_counter() - t0

    samples = W * H * SPP_PER_STEP * STEPS
    rays = samples * cfg.max_depth
    mrays_per_s = rays / dt / 1e6

    baseline_mrays = 1280 * 720 * 10 * 5 / 1e6  # 46.08 (see module docstring)
    print(json.dumps({
        "metric": "pathtrace_1080p_mrays_per_s",
        "value": round(mrays_per_s, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_per_s / baseline_mrays, 3),
    }))


if __name__ == "__main__":
    main()
