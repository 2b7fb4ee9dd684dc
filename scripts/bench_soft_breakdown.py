"""Soft-raster backward breakdown (round-4 VERDICT directive #5).

Localizes the 206 ms fwd+bwd @720p ss=2 the way BWD_BREAKDOWN.json did for
the path tracer: forward kernel alone, backward kernel alone, the XLA
table chain (pack + transforms/camera vjp), and the per-dispatch floor.

Each stage is timed with varied inputs + one chained host readback (the
tunneled platform can serve same-input re-invocations from cache and its
block_until_ready does not reliably wait).

Writes docs/artifacts/SOFT_BWD_BREAKDOWN.json and prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, args_list, steps=8):
    import jax

    r = fn(args_list[0])
    float(jax.tree.leaves(r)[0].sum())
    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        r = fn(args_list[i % len(args_list)])
    float(jax.tree.leaves(r)[0].sum())
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp

    from ptre_tpu.models import demo
    from ptre_tpu.ops import camera as cam_ops
    from ptre_tpu.ops.pallas import soft_raster as sr
    from ptre_tpu.render import rasterizer as ras
    from ptre_tpu.utils.config import RasterConfig

    W, H = 1280, 720
    scn = demo.reference_demo_scene(32, 16)
    pkt = scn.build_packet(spheres_as_triangles=True)
    cam = cam_ops.Camera.create(width=W, height=H)
    cfg = RasterConfig(width=W, height=H)
    ss = cfg.supersample
    h_ss, w_ss = H * ss, W * ss
    lanes = sr._lanes_for_width(w_ss)

    out = {"size": f"{W}x{H}", "supersample": ss,
           "triangles": int(pkt.num_triangles), "lanes": lanes}

    # varied inputs: jiggle one transform per iteration
    def pkt_i(i):
        tf = pkt.transforms.at[0, 3, 0].add(1e-4 * i)
        return pkt.replace(transforms=tf)

    idxs = list(range(9))

    # ---- full fwd (value only) and full fwd+bwd (the headline pair) ------
    fwd = jax.jit(lambda p: ras.rasterize(p, cam, cfg, soft=True))
    out["soft_fwd_ms"] = _timed(lambda i: fwd(pkt_i(i)), idxs) * 1e3

    def loss(p):
        img = ras.rasterize(p, cam, cfg, soft=True)
        return jnp.sum(img * img)

    fb = jax.jit(jax.value_and_grad(
        lambda tf: loss(pkt.replace(transforms=tf))))
    out["soft_fwdbwd_ms"] = _timed(
        lambda i: fb(pkt.transforms.at[0, 3, 0].add(1e-4 * i)), idxs) * 1e3

    # ---- stage split ------------------------------------------------------
    cols0, cbox0 = sr._soft_cols(pkt, cam, cfg)
    dil = sr._DILATE_SIGMA * 0.5
    cbox0 = cbox0.at[:, 0].add(-dil).at[:, 1].add(dil)
    cbox0 = cbox0.at[:, 2].add(-dil).at[:, 3].add(dil)
    from ptre_tpu.ops import vecmat as vm

    light = vm.normalize(jnp.asarray(cfg.light_dir, jnp.float32))
    ambient = cfg.ambient_strength * jnp.asarray(cfg.clear_color, jnp.float32)
    scal = jnp.concatenate([
        ambient, jnp.asarray(cfg.albedo, jnp.float32), light,
        jnp.asarray(cfg.clear_color, jnp.float32),
        jnp.asarray([2.0, 0.0, 1.0, 0.0], jnp.float32)])

    # XLA table chain alone: pack + dilate (the non-kernel forward work)
    pack = jax.jit(lambda p: sr._soft_cols(p, cam, cfg)[0])
    out["xla_pack_ms"] = _timed(lambda i: pack(pkt_i(i)), idxs) * 1e3

    # forward kernel alone (varied cols via the packed table)
    def fwdk(i):
        cols = cols0.at[0, 26].add(1e-6 * i)
        return sr._soft_fwd_call(scal, cbox0, cols, h_ss, w_ss, lanes, ss)[0]

    out["fwd_kernel_ms"] = _timed(fwdk, idxs) * 1e3

    _, resid = sr._soft_fwd_call(scal, cbox0, cols0, h_ss, w_ss, lanes, ss)
    dimg = jnp.ones((3, h_ss, w_ss), jnp.float32)

    def bwdk(i):
        cols = cols0.at[0, 26].add(1e-6 * i)
        return sr._soft_bwd_call(scal, cbox0, cols, resid, dimg, h_ss, w_ss,
                                 lanes, ss)

    out["bwd_kernel_ms"] = _timed(bwdk, idxs) * 1e3

    # XLA transform-chain vjp alone: d table -> d transforms (no kernels)
    def chain(tf, dcols):
        c, _ = sr._soft_cols(pkt.replace(transforms=tf), cam, cfg)
        return jnp.vdot(c, dcols)

    dcols = jnp.ones_like(cols0)
    chain_g = jax.jit(jax.grad(chain))
    out["xla_chain_vjp_ms"] = _timed(
        lambda i: chain_g(pkt.transforms.at[0, 3, 0].add(1e-4 * i), dcols),
        idxs) * 1e3

    # dispatch floor: a trivial jitted op on same-size output
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    out["dispatch_floor_ms"] = _timed(
        lambda i: tiny(z + jnp.float32(i)), idxs) * 1e3

    out = {k: (round(v, 2) if isinstance(v, float) else v)
           for k, v in out.items()}
    os.makedirs("docs/artifacts", exist_ok=True)
    with open("docs/artifacts/SOFT_BWD_BREAKDOWN.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
