"""Triangle-scale wavefront breakdown (BASELINE configs 3-4).

Localizes where the per-sample time goes in `ops/pallas/wavefront.py` at
16k-triangle scale, the way `bench_bwd_breakdown.py` did for the demo
scene — the round-4 verdict's directive before any further optimization.

Stages (all timed with a VARIED key per iteration + one chained host
readback — same-input jit re-invocations can be served from a cache on
the tunneled platform, and block_until_ready does not reliably wait):

  raygen        jittered camera rays
  fwd_d{1,2,3,5}  full wavefront forward at max_depth d; the d->d+1
                  DIFFERENCES are the per-bounce marginal cost (bounce 0
                  has no sort; deeper bounces pay sort+mask+sweep)
  sort          one coherence-key sort of the full ray state
  mask_b0       the bounce-0 mask kernel alone (per-(block, leaf) verdicts)
  shortlist_b0  XLA top_k compaction of the b0 verdicts
  sweep_b0      the sweep kernel alone, b0 shortlists precomputed
  record_fwd    trace(record=True) at full depth (the training forward)
  fwdbwd        full value_and_grad train step (fused backward kernel)

Prints one JSON line; `scripts/record_artifacts.py` stores it as
docs/artifacts/WAVEFRONT_BREAKDOWN.json.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(make_fn, keys, steps=6):
    """Time fn(key) with a different key per call; chain a host readback."""
    import jax

    r = make_fn(keys[0])
    float(jax.tree.leaves(r)[0].sum())
    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        r = make_fn(keys[i])
    float(jax.tree.leaves(r)[0].sum())
    return (time.perf_counter() - t0) / steps


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="tri", choices=["tri", "mixed"])
    p.add_argument("--size", type=int, default=None,
                   help="square image size (default: 512 tri / 1080p mixed)")
    p.add_argument("--steps", type=int, default=6)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ptre_tpu.models import demo
    from ptre_tpu.ops import camera as cam_ops, rng
    from ptre_tpu.ops.pallas import wavefront as wf
    from ptre_tpu.render import pathtracer as pt
    from ptre_tpu.utils.config import RenderConfig

    if args.scene == "tri":
        scn = demo.config3_scene(segments=128, rings=64)
        W = H = args.size or 512
    else:
        scn = demo.config4_mixed_scene(segments=128, rings=64)
        W, H = (args.size, args.size) if args.size else (1920, 1080)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=W, height=H)
    key0 = rng.key_for(11)
    keys = [rng.fold(key0, i) for i in range(64)]
    px, py = pt.pixel_grid(H, W)

    out = {"scene": args.scene, "size": f"{W}x{H}",
           "triangles": int(pkt.tri_valid.sum())}

    @jax.jit
    def raygen(k):
        jit = rng.pixel_jitter(rng.fold(k, 0x9E37), (px.shape[0],))
        return cam_ops.get_rays(cam, px, py, jit)

    out["raygen_ms"] = _timed(raygen, keys, args.steps) * 1e3
    o, d = raygen(keys[0])

    # ---- full forward at increasing depth: marginal per-bounce cost ----
    for depth in (1, 2, 3, 5):
        cfg_d = RenderConfig(width=W, height=H, max_depth=depth)
        fn = jax.jit(functools.partial(
            wf.trace, o=o, d=d, packet=pkt, config=cfg_d,
            tile_hint=(H, W)))
        out[f"fwd_d{depth}_ms"] = _timed(
            lambda k: fn(key=k), keys, args.steps) * 1e3

    cfg = RenderConfig(width=W, height=H)

    # ---- stage split at bounce 0 (replicates trace()'s packing) --------
    from ptre_tpu.ops.pallas.intersect_kernel import _pad_to
    from ptre_tpu.ops.pallas.megakernel import pack_mats

    lanes = wf._LANES
    R = o.shape[0]
    r_pad = -(-R // lanes) * lanes
    prep = wf._prepare_scene(pkt, cfg, wf._LEAF)

    state0 = jnp.concatenate([
        o.T, d.T, jnp.ones((3, R), jnp.float32),
        jnp.ones((1, R), jnp.float32), jnp.zeros((2, R), jnp.float32),
    ], axis=0)
    state0 = _pad_to(state0, lanes, axis=1)
    t_ord = wf.tile_order(H, W, 8, lanes // 8)
    if t_ord is not None and t_ord.shape[0] == R:
        perm = jnp.concatenate(
            [t_ord, jnp.arange(R, r_pad, dtype=jnp.int32)])
        state0 = state0[:, perm]

    @jax.jit
    def mask_b0(k):
        s = state0 + 0.0 * k[0].astype(jnp.float32)  # defeat result caching
        stateT = jnp.pad(s.T, ((0, 0), (0, 4)))
        return wf._mask_call(prep.scalars, stateT, prep.boxT8, lanes=lanes,
                             interpret=False)

    ik = [jnp.array([i, 0], jnp.uint32) for i in range(64)]
    out["mask_b0_ms"] = _timed(mask_b0, ik, args.steps) * 1e3
    verd0 = mask_b0(ik[0])

    @jax.jit
    def shortlist_b0(k):
        v = verd0 + 0.0 * k[0].astype(jnp.float32)
        return wf._shortlists(v, prep.n_leaf)

    out["shortlist_b0_ms"] = _timed(shortlist_b0, ik, args.steps) * 1e3
    short0, cnt0 = shortlist_b0(ik[0])
    out["b0_mean_shortlist"] = float(jnp.mean(cnt0))

    mats = pack_mats(pkt.mat_kind, pkt.mat_albedo, pkt.mat_param)
    sky = jnp.concatenate([pkt.sky_bottom, pkt.sky_top,
                           jnp.zeros(2, jnp.float32)]).astype(jnp.float32)
    urand = _pad_to(
        __import__("ptre_tpu.ops.pallas.megakernel",
                   fromlist=["x"])._build_urand(key0, R, 1), lanes, axis=1)

    @jax.jit
    def sweep_b0(k):
        s = state0 + 0.0 * k[0].astype(jnp.float32)
        return wf._wave_call(
            prep.scalars, sky, cnt0, short0, s, urand, prep.tris,
            prep.sphs, mats, sph_tile=prep.sph_tile, lanes=lanes,
            num_mats=pkt.num_materials, record_sel=False, interpret=False,
            leaf=wf._LEAF)

    out["sweep_b0_ms"] = _timed(sweep_b0, ik, args.steps) * 1e3

    scene_lo, scene_hi = prep.scene_lo, prep.scene_hi

    @jax.jit
    def sort_state(k):
        s = state0 + 0.0 * k[0].astype(jnp.float32)
        keys_ = wf._coherence_key(s, scene_lo, scene_hi)
        p_ = jnp.argsort(keys_, stable=True)
        return s[:, p_]

    out["sort_ms"] = _timed(sort_state, ik, args.steps) * 1e3

    # ---- training forward + full step ----------------------------------
    rec = jax.jit(functools.partial(
        wf.trace, o=o, d=d, packet=pkt, config=cfg, record=True,
        tile_hint=(H, W)))
    out["record_fwd_ms"] = _timed(lambda k: rec(key=k), keys, args.steps) * 1e3

    from ptre_tpu.parallel import sharding as sh
    params = sh.differentiable_params(pkt, cam)
    target = jnp.zeros((R, 3), jnp.float32)

    def loss(par, k):
        pk, cm = sh._apply_params(par, pkt, cam)
        jit = rng.pixel_jitter(rng.fold(k, 0x9E37), (px.shape[0],))
        oo, dd = cam_ops.get_rays(cm, px, py, jit)
        from ptre_tpu.ops import integrator

        c = integrator.trace(k, oo, dd, pk, cfg)
        return jnp.mean((c - target) ** 2)

    step = jax.jit(jax.value_and_grad(loss))
    out["fwdbwd_ms"] = _timed(lambda k: step(params, k), keys,
                              args.steps) * 1e3

    rays = R * cfg.max_depth
    out["fwd_mrays_per_s"] = rays / out["fwd_d5_ms"] / 1e3
    out["fwdbwd_mrays_per_s"] = rays / out["fwdbwd_ms"] / 1e3
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
