"""Forward+backward time breakdown at 1080p (the BASELINE headline metric).

Decomposes one spp=1 train step (fused-selection kernel + differentiable
replay, `ops/path_replay.py`) into its stages, each timed separately on the
real chip, so PERF.md can say where backward time goes:

  1. urand       — external threefry scatter uniforms (`_build_urand`)
  2. raygen      — camera inverse-pipeline primary rays
  3. sel_kernel  — `megakernel.trace_fused_sel` (the O(R*P) sweep, fwd only)
  4. replay_fwd  — `path_replay.replay` forward (O(R*B) XLA)
  5. replay_fwdbwd — value_and_grad through replay ONLY (sel held constant)
  6. full_step   — end-to-end value_and_grad (what bench.py times)

Prints one JSON line. Stages overlap (full_step ~= urand + raygen +
sel_kernel + replay_fwdbwd + remat recompute), so the residual column is the
scan/remat bookkeeping cost.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, steps=6):
    import jax

    r = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), r)
    float(jax.tree.leaves(r)[0].sum())  # tunnel-safe hard sync
    t0 = time.perf_counter()
    for _ in range(steps):
        r = fn(*args)
    float(jax.tree.leaves(r)[0].sum())
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp

    from ptre_tpu.models import demo
    from ptre_tpu.ops import camera as cam_ops, path_replay, rng
    from ptre_tpu.ops.pallas import megakernel as mk
    from ptre_tpu.parallel import sharding as sh
    from ptre_tpu.render import pathtracer as pt
    from ptre_tpu.utils.config import RenderConfig

    W, H = 1920, 1080
    scn = demo.reference_demo_scene(32, 16)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=W, height=H)
    cfg = RenderConfig(width=W, height=H)
    key = rng.key_for(1984)
    px, py = pt.pixel_grid(H, W)
    R = px.shape[0]
    params = sh.differentiable_params(pkt, cam)

    out = {"size": f"{W}x{H}", "rays_per_step": R * cfg.max_depth}

    # 1. urand
    urand_fn = jax.jit(lambda k: mk._build_urand(k, R, cfg.max_depth))
    out["urand_ms"] = _time(urand_fn, key) * 1e3

    # 2. raygen
    def raygen(k):
        jit = rng.pixel_jitter(rng.fold(k, 0x9E37), (R,))
        return cam_ops.get_rays(cam, px, py, jit)

    raygen_fn = jax.jit(raygen)
    out["raygen_ms"] = _time(raygen_fn, key) * 1e3
    o, d = raygen_fn(key)
    o = jax.block_until_ready(o)

    # 3. selection kernel (includes its own urand internally)
    sel_fn = jax.jit(
        lambda k, oo, dd: mk.trace_fused_sel(k, oo, dd, pkt, cfg))
    out["sel_kernel_ms"] = _time(sel_fn, key, o, d) * 1e3
    sel, urand = sel_fn(key, o, d)
    sel = jax.block_until_ready(sel)

    # 4. replay forward (big arrays as jit args, not baked constants — the
    # compile tunnel rejects multi-MB constant-laden HLO)
    def rep(pr, oo, dd, s, u):
        return path_replay.replay(
            oo, dd, s, u, sh._apply_params(pr, pkt, cam)[0], cfg).mean()

    rep_fn = jax.jit(rep)
    out["replay_fwd_ms"] = _time(rep_fn, params, o, d, sel, urand) * 1e3

    # 5. replay forward+backward (sel/urand constant)
    rep_vg = jax.jit(jax.value_and_grad(rep))
    out["replay_fwdbwd_ms"] = _time(rep_vg, params, o, d, sel, urand) * 1e3

    # 6. fully-fused gradient path (round 3, `ops/pallas/fused_grad.py`):
    # forward = recording megakernel; backward = single fused kernel
    from ptre_tpu.ops.pallas import fused_grad

    def fused_loss(pr, k):
        pk, cm = sh._apply_params(pr, pkt, cam)
        jit = rng.pixel_jitter(rng.fold(k, 0x9E37), (R,))
        oo, dd = cam_ops.get_rays(cm, px, py, jit)
        return fused_grad.trace_grad(k, oo, dd, pk, cfg).mean()

    out["fused_fwd_ms"] = _time(jax.jit(fused_loss), params, key) * 1e3
    fused_vg = jax.jit(jax.value_and_grad(fused_loss))
    out["fused_fwdbwd_ms"] = _time(fused_vg, params, key) * 1e3

    # 7. full step (bench.py's loss at spp=1; routes through the fused path
    # on TPU via integrator.trace)
    from ptre_tpu.ops import integrator

    def loss(pr, k):
        pk, cm = sh._apply_params(pr, pkt, cam)
        jit = rng.pixel_jitter(rng.fold(k, 0x9E37), (R,))
        oo, dd = cam_ops.get_rays(cm, px, py, jit)
        return integrator.trace(k, oo, dd, pk, cfg).mean()

    full = jax.jit(jax.value_and_grad(loss))
    out["full_step_ms"] = _time(full, params, key) * 1e3

    out = {k: (round(v, 2) if isinstance(v, float) else v)
           for k, v in out.items()}
    out["fwdbwd_mrays_per_s"] = round(
        R * cfg.max_depth / out["full_step_ms"] / 1e3, 1)
    os.makedirs("docs/artifacts", exist_ok=True)
    with open("docs/artifacts/BWD_BREAKDOWN.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
