"""Wavefront path tracing for triangle-scale scenes: sorted ray batches,
an XLA-compacted cull shortlist, and a shortlist-driven Pallas sweep.

The fused megakernel (`megakernel.py`) keeps the whole bounce loop in one
dispatch — the right call for demo-class scenes where the sweep is cheap.
At triangle scale (BASELINE configs 3-4, the reference's scaling cliff at
`path_tracer.cu:263-282`) the closest-hit sweep dominates, and the binding
constraint becomes RAY COHERENCE: tile culling is block-grained (the VPU
sweeps whole (tile, lanes) blocks), so a block's cull rate is set by the
UNION of its rays' frustums. Measured on config 3 (16k-tri uv_sphere,
512^2): secondary-bounce blocks in pixel order sweep 26% of the scene's
64-row tiles; the same rays sorted by (direction octant, origin Morton
cell) sweep 12%, and primary rays blocked as 2D pixel tiles instead of
pixel rows sweep 6% instead of 12%.

So this module un-fuses the bounce loop — the classic wavefront design,
reborn TPU-style. Per bounce:

  1. live rays are sorted by a coherence key (terminated rays sink to the
     back, where whole blocks skip via `pl.when`) — sorting replaces the
     per-thread divergence handling a GPU megakernel gets from its SIMT
     scheduler. The sort is skipped once the live fraction is small
     (`lax.cond`): stragglers sweep a little more, but there are few;
  2. a small MASK kernel computes the per-(ray-block, leaf-tile) AABB slab
     verdicts — the per-lane UNION, far tighter than any block-bounds
     test — as a dense vector output. Everything stays in vector registers:
     no `pl.when`, no vector->scalar transfers (measured ~1 us EACH on this
     chip — the round-3 two-level in-kernel traversal spent more time
     scalarizing its slab tests than sweeping);
  3. XLA compacts the verdict mask into per-block SHORTLISTS of surviving
     leaf indices (stable argsort; pad entries point at an all-invalid pad
     leaf, so the sweep loop needs no tail case);
  4. the SWEEP kernel walks exactly the shortlist — a `fori_loop` over
     SMEM-resident leaf indices with NO branches in the hot path — and
     merges closest hits in groups (one best-t/best-i accumulator VMEM
     round-trip per group). Winner attributes are re-derived via one-hot
     MXU matmuls over the [min, max] winner-leaf range, then the shared
     `_scatter_shade` bounce shading runs in the same kernel.

Scatter uniforms are drawn per ORIGINAL ray id and gathered through the
sort permutation, so the result is bit-identical to the fused culled /
brute megakernel on the same key (closest-hit ties break to the lowest
Morton-sorted index both here and there).

Gradients: `trace(record=True)` also returns per-bounce winner selections
+ uniforms (scattered back to original ray order), which feed the SAME
fused backward kernel (`fused_grad`) — the O(R*P) sweep stays out of
autodiff entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptre_tpu.ops.pallas.intersect_kernel import _pad_to, _tile_for
from ptre_tpu.ops.pallas.megakernel import (
    _BIG, _MAX_MATS, _empty_boxes, _scatter_shade, morton_order, pack_mats,
    pack_sph16, pack_tile_boxes, pack_tri32,
)

#: VMEM budget for the resident (T, 32) triangle table: the per-bounce
#: kernel's footprint is smaller than the fused megakernel's (no urand
#: blocks, no bounce-loop live state), so the ceiling is HIGHER — measured
#: working at 30k+ where `megakernel.trace_fused` VMEM-OOMs.
_MAX_WAVE_TRIS = 49152
_MAX_WAVE_SPHS = 4096


def supports(packet) -> bool:
    """Whether the wavefront path can run this packet."""
    if packet.num_materials > _MAX_MATS:
        return False
    return (packet.tri_valid.shape[0] <= _MAX_WAVE_TRIS
            and packet.sph_center.shape[0] <= _MAX_WAVE_SPHS)

#: triangle rows per leaf tile (the sweep/cull granularity). 64 balances
#: cull precision (finer = fewer swept pairs) against the mask kernel's
#: dense verdict cost and the per-visit overhead (~0.4 us: dynamic slice +
#: accumulator round-trip) — tuned on the chip, scripts/bench_tri.py.
_LEAF = 64
_LANES = 512
#: leaves merged per sweep-loop step (one accumulator round-trip per group)
_SWEEP_GROUP = 4
#: sort is skipped below this live-ray fraction (stragglers sweep slightly
#: more; the sort's fixed ~6 ms would dominate their tiny sweep)
_SORT_MIN_LIVE = 0.125
#: sort cadence: re-sort before bounce b>0 when (b-1) % _SORT_EVERY == 0.
#: 1 = every bounce. The sort is 71.5 of each ~175 ms bounce at 1080p
#: (WAVEFRONT_BREAKDOWN.json), so halving the cadence was A/B'd (round 5,
#: config 4 fwd, bit-identical images): cadence 2 ran 1037 vs 904
#: ms/sample — the stale order's extra sweep (~200 ms) exceeds the two
#: sorts saved (~143 ms). Every-bounce sorting kept; the knob stays for
#: scenes with cheaper decoherence.
_SORT_EVERY = 1


def _mask_kernel(scal_ref, stateT_ref, boxT8_ref, verd_ref, *, lanes):
    """Per-(ray-block, leaf) AABB slab verdicts, fully vectorized.

    Axes are FLIPPED vs the sweep kernel: rays ride the sublane axis in
    8-ray chunks (``stateT`` is the transposed state) and leaf boxes ride
    the lanes (``boxT8`` is the transposed box table), so the per-box
    reduction is over sublanes and each 128-box verdict group stores as one
    aligned (1, 128) tile — no sub-128 dynamic stores, no vector->scalar
    transfers anywhere.
    """
    t_min = scal_ref[0]
    n_groups = verd_ref.shape[2] // 128
    r_chunks = lanes // 8

    # block-level activity: any live ray (cheap vector test on the act col)
    act_col = stateT_ref[:, 9:10]  # (lanes, 1)

    verd_ref[...] = jnp.zeros_like(verd_ref)

    @pl.when(jnp.max(act_col) > 0.5)
    def _():
        def box_group(c, carry):
            base = c * 128
            lox = boxT8_ref[0:1, pl.dslice(base, 128)]
            loy = boxT8_ref[1:2, pl.dslice(base, 128)]
            loz = boxT8_ref[2:3, pl.dslice(base, 128)]
            hix = boxT8_ref[3:4, pl.dslice(base, 128)]
            hiy = boxT8_ref[4:5, pl.dslice(base, 128)]
            hiz = boxT8_ref[5:6, pl.dslice(base, 128)]
            acc = jnp.zeros((1, 128), jnp.float32)
            for r in range(r_chunks):
                s = stateT_ref[r * 8:(r + 1) * 8, :]  # (8, 12)
                ox, oy, oz = s[:, 0:1], s[:, 1:2], s[:, 2:3]
                dx, dy, dz = s[:, 3:4], s[:, 4:5], s[:, 5:6]
                af = s[:, 9:10]

                def inv(c_):
                    return 1.0 / jnp.where(
                        jnp.abs(c_) < 1e-12,
                        jnp.where(c_ >= 0.0, 1e-12, -1e-12), c_)

                ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)
                tnx = (jnp.where(ivx >= 0.0, lox, hix) - ox) * ivx
                tfx = (jnp.where(ivx >= 0.0, hix, lox) - ox) * ivx
                tny = (jnp.where(ivy >= 0.0, loy, hiy) - oy) * ivy
                tfy = (jnp.where(ivy >= 0.0, hiy, loy) - oy) * ivy
                tnz = (jnp.where(ivz >= 0.0, loz, hiz) - oz) * ivz
                tfz = (jnp.where(ivz >= 0.0, hiz, loz) - oz) * ivz
                tn = jnp.maximum(jnp.maximum(tnx, tny), tnz)
                tf = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
                ok = ((tn <= tf) & (tf >= t_min)).astype(jnp.float32) * af
                acc = jnp.maximum(acc, jnp.max(ok, axis=0, keepdims=True))
            verd_ref[0, 0:1, pl.dslice(base, 128)] = acc
            return carry

        jax.lax.fori_loop(0, n_groups, box_group, 0)


@functools.partial(jax.jit, static_argnames=("lanes", "interpret"))
def _mask_call(scalars, stateT, boxT8, *, lanes, interpret):
    nb = stateT.shape[0] // lanes
    n_l128 = boxT8.shape[1]
    return pl.pallas_call(
        functools.partial(_mask_kernel, lanes=lanes),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((lanes, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_l128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 1, n_l128), jnp.float32),
        interpret=interpret,
    )(scalars, stateT, boxT8)


def _shortlists_from_mask(mask, n_leaf):
    """(nb, n_leaf) bool survival mask → (shortlist (nb, 1, nL + G),
    cnt_pad (nb, 1, 1)).

    Surviving leaf indices first (ascending — preserves the Morton
    tie-break order), then the pad leaf ``n_leaf``; counts padded up to a
    whole sweep group.
    """
    nb = mask.shape[0]
    cnt = jnp.sum(mask, axis=1).astype(jnp.int32)
    # top_k on the 0/1 mask: indices of 1s first, ties broken by LOWEST
    # index — surviving leaves ascending (the Morton tie-break order), much
    # faster than a row argsort on TPU
    _, order = jax.lax.top_k(mask.astype(jnp.float32), mask.shape[1])
    order = order.astype(jnp.int32)
    g = _SWEEP_GROUP
    cnt_pad = ((cnt + g - 1) // g) * g
    idx = jnp.arange(n_leaf, dtype=jnp.int32)[None, :]
    short = jnp.where(idx < cnt[:, None], order, jnp.int32(n_leaf))
    short = jnp.concatenate(
        [short, jnp.full((nb, g), n_leaf, jnp.int32)], axis=1)
    return short[:, None, :], cnt_pad[:, None, None]


def _shortlists(verd, n_leaf):
    """(nb, 1, nL128) mask-kernel verdicts → per-block shortlists."""
    return _shortlists_from_mask(verd[:, 0, :n_leaf] > 0.5, n_leaf)


def _wave_kernel(
    scal_ref,  # SMEM f32 (8,): t_min t_max det_eps shadow_eps pdf_eps pad
    sky_ref,  # SMEM f32 (8,)
    cnt_ref,  # SMEM i32 (1, 1, 1): padded shortlist length for this block
    list_ref,  # SMEM i32 (1, 1, nL + G): surviving leaf ids, pad = n_leaf
    state_ref,  # (12, lanes) block: o.xyz d.xyz rgb active pad pad
    ur_ref,  # (2, lanes) block: this bounce's scatter uniforms
    tri_ref,  # (T_pad, 32) resident, Morton order (+ trailing pad leaf)
    sph_ref,  # (S_pad, 16) resident
    mat_ref,  # SMEM (8, 8)
    out_ref,  # (12, lanes) block out: next state
    *maybe_sel_and_scratch,  # [sel_ref (4, lanes) if record_sel,] scr_ref
    sph_tile: int,
    num_mats: int,
    record_sel: bool,
    leaf: int,
):
    if record_sel:
        sel_ref, scr_ref = maybe_sel_and_scratch
    else:
        (scr_ref,) = maybe_sel_and_scratch
        sel_ref = None
    t_min = scal_ref[0]
    t_max = scal_ref[1]
    det_eps = scal_ref[2]
    shadow_eps = scal_ref[3]
    pdf_eps = scal_ref[4]
    lanes = state_ref.shape[1]

    ox, oy, oz = state_ref[0:1, :], state_ref[1:2, :], state_ref[2:3, :]
    dx, dy, dz = state_ref[3:4, :], state_ref[4:5, :], state_ref[5:6, :]
    active = state_ref[9:10, :] > 0.5

    if sel_ref is not None:
        sel_ref[...] = jnp.zeros_like(sel_ref)

    # default: pass state through unchanged (all-dead blocks)
    out_ref[...] = state_ref[...]

    @pl.when(jnp.max(state_ref[9:10, :]) > 0.5)
    def _bounce():
        scr_ref[0:1, :] = jnp.full((1, lanes), _BIG, jnp.float32)  # best_t
        scr_ref[1:2, :] = jnp.zeros((1, lanes), jnp.float32)  # best_i
        scr_ref[2:3, :] = jnp.zeros((1, lanes), jnp.float32)  # tri_hit

        # ---- shortlist-driven sweep: _SWEEP_GROUP leaves per step, no ----
        # branches in the loop body at all
        def sweep_group(g, carry):
            parts = []
            for u in range(_SWEEP_GROUP):
                jl = list_ref[0, 0, g * _SWEEP_GROUP + u]
                blk = tri_ref[pl.dslice(jl * leaf, leaf), :]
                v0x, v0y, v0z = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
                v1x, v1y, v1z = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
                v2x, v2y, v2z = blk[:, 6:7], blk[:, 7:8], blk[:, 8:9]
                valid = blk[:, 18:19] > 0.5
                e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
                e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = 1.0 / jnp.where(jnp.abs(det) < det_eps, 1.0, det)
                tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
                u_ = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                acc = (
                    (jnp.abs(det) >= det_eps)
                    & (u_ >= 0.0) & (u_ <= 1.0) & (v >= 0.0)
                    & (u_ + v <= 1.0)
                    & (t >= t_min) & (t <= t_max) & valid
                )
                tm = jnp.where(acc, t, _BIG)
                gmin = jnp.min(tm, axis=0, keepdims=True)
                garg = (jnp.argmin(tm, axis=0).reshape(1, -1).astype(
                    jnp.float32) + (jl * leaf).astype(jnp.float32))
                ghit = jnp.any(acc, axis=0, keepdims=True)
                parts.append((gmin, garg, ghit))

            # merge the group's leaves (strict < keeps the earlier =
            # lower-Morton leaf on ties, same rule as the megakernel)
            m, a, h = parts[0]
            for m2, a2, h2 in parts[1:]:
                upd = m2 < m
                a = jnp.where(upd, a2, a)
                m = jnp.where(upd, m2, m)
                h = h | h2
            best = scr_ref[0:1, :]
            upd = m < best
            scr_ref[1:2, :] = jnp.where(upd, a, scr_ref[1:2, :])
            scr_ref[0:1, :] = jnp.where(upd, m, best)
            scr_ref[2:3, :] = jnp.maximum(
                scr_ref[2:3, :], h.astype(jnp.float32))
            return carry

        jax.lax.fori_loop(0, cnt_ref[0, 0, 0] // _SWEEP_GROUP,
                          sweep_group, 0)

        best_t = scr_ref[0:1, :]
        best_if = scr_ref[1:2, :]
        tri_hit = scr_ref[2:3, :] > 0.5
        tri_best = jnp.where(tri_hit, best_t, t_max)

        # ---- sphere sweep (bounded by the closest triangle) ---------------
        n_sph_tiles = sph_ref.shape[0] // sph_tile
        sph_t = jnp.full((1, lanes), _BIG, jnp.float32)
        sph_i = jnp.zeros((1, lanes), jnp.int32)
        sph_hit = jnp.zeros((1, lanes), jnp.bool_)
        for js in range(n_sph_tiles):
            blk = sph_ref[js * sph_tile:(js + 1) * sph_tile, :]
            cx, cy, cz = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
            r = blk[:, 3:4]
            valid = blk[:, 4:5] > 0.5
            ocx, ocy, ocz = cx - ox, cy - oy, cz - oz
            halfb = dx * ocx + dy * ocy + dz * ocz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            delta = halfb * halfb - c
            sq = jnp.sqrt(jnp.maximum(delta, 0.0))
            t_near = halfb - sq
            t = jnp.where(t_near >= t_min, t_near, halfb + sq)
            acc = (delta >= 0.0) & (t_near <= tri_best) & (t >= t_min) & valid
            tm = jnp.where(acc, t, _BIG)
            tile_min = jnp.min(tm, axis=0, keepdims=True)
            tile_arg = jnp.argmin(tm, axis=0).reshape(1, -1).astype(jnp.int32)
            upd = tile_min < sph_t
            sph_i = jnp.where(upd, js * sph_tile + tile_arg, sph_i)
            sph_t = jnp.where(upd, tile_min, sph_t)
            sph_hit = sph_hit | jnp.any(acc, axis=0, keepdims=True)

        hit = tri_hit | sph_hit
        use_sph = sph_hit

        if sel_ref is not None:
            sel_ref[0:1, :] = best_if
            sel_ref[1:2, :] = sph_i.astype(jnp.float32)
            sel_ref[2:3, :] = use_sph.astype(jnp.float32)
            sel_ref[3:4, :] = (hit & active).astype(jnp.float32)

        # ---- winner gather: one-hot MXU matmuls over the [min, max] -------
        # winner-leaf range (sorted blocks concentrate winners in a few
        # consecutive Morton leaves; no per-leaf gates)
        scr_ref[8:40, :] = jnp.zeros((32, lanes), jnp.float32)
        tri_hit_f = tri_hit.astype(jnp.float32)

        @pl.when(jnp.max(tri_hit_f) > 0.5)
        def _gather():
            bi_lo = jnp.where(tri_hit, best_if, jnp.float32(_BIG))
            bi_hi = jnp.where(tri_hit, best_if, -1.0)
            lo_leaf = jnp.min(bi_lo).astype(jnp.int32) // leaf
            hi_leaf = jnp.max(bi_hi).astype(jnp.int32) // leaf

            def gather_one(jl, carry):
                base_f = (jl * leaf).astype(jnp.float32)
                blk = tri_ref[pl.dslice(jl * leaf, leaf), :]
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (leaf, lanes), 0).astype(jnp.float32)
                onehot = (((rows + base_f) == best_if).astype(jnp.float32)
                          * tri_hit_f)
                scr_ref[8:40, :] = scr_ref[8:40, :] + jax.lax.dot_general(
                    blk, onehot, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return carry

            jax.lax.fori_loop(lo_leaf, hi_leaf + 1, gather_one, 0)

        tri_attr = scr_ref[8:40, :]
        sph_attr = jnp.zeros((16, lanes), jnp.float32)
        for js in range(n_sph_tiles):
            blk = sph_ref[js * sph_tile:(js + 1) * sph_tile, :]
            rows = jax.lax.broadcasted_iota(jnp.int32, (sph_tile, lanes), 0)
            onehot = (rows + js * sph_tile == sph_i).astype(jnp.float32)
            sph_attr = sph_attr + jax.lax.dot_general(
                blk, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        # ---- per-lane winner attrs (same algebra as megakernel) -----------
        gv = lambda i: tri_attr[i:i + 1, :]
        e1x, e1y, e1z = gv(3) - gv(0), gv(4) - gv(1), gv(5) - gv(2)
        e2x, e2y, e2z = gv(6) - gv(0), gv(7) - gv(1), gv(8) - gv(2)
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
        tvx, tvy, tvz = ox - gv(0), oy - gv(1), oz - gv(2)
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t_tri = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        w_ = 1.0 - u - v
        tnx = w_ * gv(9) + u * gv(12) + v * gv(15)
        tny = w_ * gv(10) + u * gv(13) + v * gv(16)
        tnz = w_ * gv(11) + u * gv(14) + v * gv(17)
        tlen = jnp.sqrt(tnx * tnx + tny * tny + tnz * tnz)
        tinv = jnp.where(tlen > 0.0,
                         1.0 / jnp.where(tlen > 0.0, tlen, 1.0), 0.0)
        tnx, tny, tnz = tnx * tinv, tny * tinv, tnz * tinv
        gnx = e1y * e2z - e1z * e2y
        gny = e1z * e2x - e1x * e2z
        gnz = e1x * e2y - e1y * e2x
        tri_front = (dx * gnx + dy * gny + dz * gnz) < 0.0
        tsign = jnp.where(tri_front, 1.0, -1.0)
        tnx, tny, tnz = tnx * tsign, tny * tsign, tnz * tsign
        tri_mat = tri_attr[19:20, :]

        scx, scy, scz = sph_attr[0:1, :], sph_attr[1:2, :], sph_attr[2:3, :]
        srad = sph_attr[3:4, :]
        ocx, ocy, ocz = scx - ox, scy - oy, scz - oz
        halfb = dx * ocx + dy * ocy + dz * ocz
        c = ocx * ocx + ocy * ocy + ocz * ocz - srad * srad
        delta = halfb * halfb - c
        sq = jnp.sqrt(jnp.maximum(delta, 0.0))
        t_near = halfb - sq
        t_s = jnp.where(t_near >= t_min, t_near, halfb + sq)
        inv_r = 1.0 / jnp.where(srad == 0.0, 1.0, srad)
        spx = ox + t_s * dx
        spy = oy + t_s * dy
        spz = oz + t_s * dz
        snx = (spx - scx) * inv_r
        sny = (spy - scy) * inv_r
        snz = (spz - scz) * inv_r
        s_front = (dx * snx + dy * sny + dz * snz) < 0.0
        ssign = jnp.where(s_front, 1.0, -1.0)
        snx, sny, snz = snx * ssign, sny * ssign, snz * ssign
        sph_mat = sph_attr[5:6, :]

        px = jnp.where(use_sph, spx, ox + t_tri * dx)
        py = jnp.where(use_sph, spy, oy + t_tri * dy)
        pz = jnp.where(use_sph, spz, oz + t_tri * dz)
        nx = jnp.where(use_sph, snx, tnx)
        ny = jnp.where(use_sph, sny, tny)
        nz = jnp.where(use_sph, snz, tnz)
        mat_id = jnp.where(use_sph, sph_mat, tri_mat)

        u1 = ur_ref[0:1, :]
        u2 = ur_ref[1:2, :]
        f_r, f_g, f_b, wix, wiy, wiz, is_emissive = _scatter_shade(
            nx, ny, nz, dx, dy, dz, mat_id, u1, u2, mat_ref, num_mats,
            pdf_eps, sky_ref, hit)

        cr, cg, cb = state_ref[6:7, :], state_ref[7:8, :], state_ref[8:9, :]
        next_active = active & hit & ~is_emissive
        out_ref[6:7, :] = cr * jnp.where(active, f_r, 1.0)
        out_ref[7:8, :] = cg * jnp.where(active, f_g, 1.0)
        out_ref[8:9, :] = cb * jnp.where(active, f_b, 1.0)
        out_ref[0:1, :] = jnp.where(next_active, px + shadow_eps * nx, ox)
        out_ref[1:2, :] = jnp.where(next_active, py + shadow_eps * ny, oy)
        out_ref[2:3, :] = jnp.where(next_active, pz + shadow_eps * nz, oz)
        out_ref[3:4, :] = jnp.where(next_active, wix, dx)
        out_ref[4:5, :] = jnp.where(next_active, wiy, dy)
        out_ref[5:6, :] = jnp.where(next_active, wiz, dz)
        out_ref[9:10, :] = next_active.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("sph_tile", "lanes", "num_mats", "record_sel",
                     "interpret", "leaf"))
def _wave_call(scalars, sky, cnt, short, state, urand, tris, sphs, mats, *,
               sph_tile, lanes, num_mats, record_sel, interpret, leaf):
    r_pad = state.shape[1]
    nl_w = short.shape[2]
    out_specs = pl.BlockSpec((12, lanes), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((12, r_pad), jnp.float32)
    if record_sel:
        out_specs = [out_specs,
                     pl.BlockSpec((4, lanes), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((4, r_pad), jnp.float32)]
    return pl.pallas_call(
        functools.partial(
            _wave_kernel, sph_tile=sph_tile, num_mats=num_mats,
            record_sel=record_sel, leaf=leaf),
        grid=(r_pad // lanes,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nl_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((12, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((56, lanes), jnp.float32)],
        interpret=interpret,
    )(scalars, sky, cnt, short, state, urand, tris, sphs, mats)


def _coherence_key(state, lo, hi):
    """Sort key for one bounce's rays: dead rays last, then direction
    octant + 6-bit xy direction bins + 15-bit origin Morton cell. int32."""
    o = state[0:3, :]
    d = state[3:6, :]
    act = state[9, :] > 0.5
    span = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((o - lo[:, None]) / span[:, None] * 31.0, 0.0, 31.0).astype(
        jnp.int32)

    def spread(x):
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    mo = spread(q[0]) | (spread(q[1]) << 1) | (spread(q[2]) << 2)
    oct_ = ((d[0] >= 0).astype(jnp.int32) * 4
            + (d[1] >= 0).astype(jnp.int32) * 2
            + (d[2] >= 0).astype(jnp.int32))
    db = jnp.clip(((d[0:2] + 1.0) * 3.99).astype(jnp.int32), 0, 7)
    key = (oct_ << 21) | ((db[0] * 8 + db[1]) << 15) | mo
    return jnp.where(act, key, jnp.int32(0x40000000))


class _SceneArrays:
    """Packed per-scene arrays shared by every bounce of a trace: the
    Morton-ordered resident triangle table (+ trailing pad leaf), the
    transposed leaf-AABB table for the mask kernel, packed spheres, and
    the scene bounds for the coherence key. ``leaf_screen`` (optional) is
    the per-leaf screen-space bbox table for bounce-0 binning."""

    __slots__ = ("scalars", "tris", "boxT8", "sphs", "sph_tile", "n_leaf",
                 "scene_lo", "scene_hi", "perm_tri", "leaf_screen")

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw.get(k))


#: extra dilation (in pixels) applied to leaf screen bboxes on top of the
#: ±0.5 px jitter accounted in the tile extents — absorbs float error
#: between the projection algebra here and the Möller–Trumbore algebra in
#: the sweep (edge hits must never be binned out).
_SCREEN_DILATE = 1.0
#: clip-w below which a vertex counts as on/behind the eye plane; such
#: triangles wrap around under projection, so their bbox is conservatively
#: the full screen.
_W_EPS = 1e-6


def _leaf_screen_boxes(v0, v1, v2, tri_valid, cam, leaf, n_leaf):
    """Per-leaf screen bboxes (n_leaf, 4): (minx, maxx, miny, maxy) in
    CONTINUOUS pixel coordinates of the camera that generated the primary
    rays (`camera.get_rays` convention: sample x = px + jitter, so NDC x =
    (x / W) * 2 - 1 exactly).

    Bounce-0 rays are camera rays, so a leaf's candidate rays are exactly
    the pixels its projected triangles can cover — a 2D overlap test, far
    tighter than the 3D slab union of a camera-frustum ray block (the
    round-4 constants table measured 2.9 % b0 survival for 3D blocks; the
    screen footprint of a 64-triangle Morton leaf is a small patch).
    Conservative everywhere: invalid rows get a never-overlap box;
    near-plane-crossing triangles (any vertex w <= _W_EPS, where the
    projected footprint is not the vertex hull) get the full screen.
    """
    from ptre_tpu.ops import vecmat as vm

    W, H = float(cam.width), float(cam.height)
    vp = cam.view_matrix() @ cam.projection_matrix()
    big = jnp.float32(3e38)

    sxs, sys_, ws = [], [], []
    for v in (v0, v1, v2):
        ndc, w = vm.project_points(v, vp)
        sxs.append((ndc[:, 0] + 1.0) * 0.5 * W)
        sys_.append((1.0 - ndc[:, 1]) * 0.5 * H)
        ws.append(w)
    sx = jnp.stack(sxs, axis=1)  # (T, 3)
    sy = jnp.stack(sys_, axis=1)
    wmin = jnp.minimum(jnp.minimum(ws[0], ws[1]), ws[2])  # (T,)

    safe = wmin > _W_EPS
    minx = jnp.where(safe, jnp.min(sx, axis=1) - _SCREEN_DILATE, -big)
    maxx = jnp.where(safe, jnp.max(sx, axis=1) + _SCREEN_DILATE, big)
    miny = jnp.where(safe, jnp.min(sy, axis=1) - _SCREEN_DILATE, -big)
    maxy = jnp.where(safe, jnp.max(sy, axis=1) + _SCREEN_DILATE, big)
    # invalid rows: never-overlap box
    minx = jnp.where(tri_valid, minx, big)
    maxx = jnp.where(tri_valid, maxx, -big)
    miny = jnp.where(tri_valid, miny, big)
    maxy = jnp.where(tri_valid, maxy, -big)

    boxes = jnp.stack([minx, maxx, miny, maxy], axis=1)  # (T, 4)
    T = boxes.shape[0]
    pad = n_leaf * leaf - T
    empty = jnp.tile(jnp.array([[big, -big, big, -big]], jnp.float32),
                     (pad, 1))
    boxes = jnp.concatenate([boxes, empty], axis=0).reshape(n_leaf, leaf, 4)
    return jnp.stack([
        jnp.min(boxes[:, :, 0], axis=1), jnp.max(boxes[:, :, 1], axis=1),
        jnp.min(boxes[:, :, 2], axis=1), jnp.max(boxes[:, :, 3], axis=1),
    ], axis=1)  # (n_leaf, 4)


def _screen_block_mask(leaf_screen, height, width, rows, cols):
    """(nb, n_leaf) survival mask: does leaf's screen bbox overlap each
    2D pixel-tile block of the bounce-0 `tile_order` layout?

    Block (ti, tj) covers pixels y in [ti*rows, (ti+1)*rows), x in
    [tj*cols, (tj+1)*cols); sample coords extend ±0.5 px beyond pixel
    indices (the jitter range), so tile extents are [lo - 0.5, hi + 0.5).
    """
    n_ti, n_tj = height // rows, width // cols
    ty0 = jnp.arange(n_ti, dtype=jnp.float32)[:, None, None] * rows - 0.5
    tx0 = jnp.arange(n_tj, dtype=jnp.float32)[None, :, None] * cols - 0.5
    hit = (
        (leaf_screen[None, None, :, 0] <= tx0 + cols)
        & (leaf_screen[None, None, :, 1] >= tx0)
        & (leaf_screen[None, None, :, 2] <= ty0 + rows)
        & (leaf_screen[None, None, :, 3] >= ty0)
    )  # (n_ti, n_tj, n_leaf)
    return hit.reshape(n_ti * n_tj, -1)


def _prepare_scene(packet, config, leaf, screen_cam=None):
    """Pack the per-scene arrays for `trace` (see `_SceneArrays`).

    ``screen_cam``: optional Camera — also build the per-leaf screen bbox
    table for bounce-0 screen-space binning (`_leaf_screen_boxes`).
    """
    v0, v1, v2, n0, n1, n2 = packet.world_triangles()
    scalars = jnp.array(
        [config.t_min, config.t_max, config.det_eps, config.shadow_eps,
         config.pdf_eps, 0.0, 0.0, 0.0], jnp.float32)

    tri_valid, tri_mat = packet.tri_valid, packet.tri_mat
    perm_tri = None
    if v0.shape[0] > 0:
        perm_tri = morton_order(v0, v1, v2, tri_valid)
        v0, v1, v2 = v0[perm_tri], v1[perm_tri], v2[perm_tri]
        n0, n1, n2 = n0[perm_tri], n1[perm_tri], n2[perm_tri]
        tri_valid, tri_mat = tri_valid[perm_tri], tri_mat[perm_tri]

    if v0.shape[0] == 0:
        tris = jnp.zeros((leaf, 32), jnp.float32)  # just the pad leaf
        boxL = _empty_boxes(128)
    else:
        tris = pack_tri32(v0, v1, v2, n0, n1, n2, tri_valid, tri_mat, leaf)
        boxL = pack_tile_boxes(v0, v1, v2, tri_valid, leaf)
        boxL = jnp.concatenate(
            [boxL, _empty_boxes((-boxL.shape[0]) % 128)], axis=0)
        tris = _pad_to(tris, boxL.shape[0] * leaf, axis=0)
        # one extra ALL-INVALID leaf: shortlist pad entries point at it
        tris = jnp.concatenate(
            [tris, jnp.zeros((leaf, 32), jnp.float32)], axis=0)
    boxT8 = boxL.T  # (8, nL128): box components on rows, boxes on lanes
    n_leaf = tris.shape[0] // leaf - 1
    sph_tile = _tile_for(packet.sph_center.shape[0])
    sphs = pack_sph16(packet.sph_center, packet.sph_radius,
                      packet.sph_valid, packet.sph_mat, sph_tile)

    # scene bbox for the origin Morton cells of the coherence key
    if v0.shape[0] > 0:
        pts_lo = jnp.minimum(jnp.minimum(v0, v1), v2)
        pts_hi = jnp.maximum(jnp.maximum(v0, v1), v2)
        vf = tri_valid.astype(jnp.float32)[:, None]
        scene_lo = jnp.min(jnp.where(vf > 0.5, pts_lo, 1e30), axis=0)
        scene_hi = jnp.max(jnp.where(vf > 0.5, pts_hi, -1e30), axis=0)
    else:
        scene_lo = jnp.zeros(3)
        scene_hi = jnp.ones(3)

    leaf_screen = None
    if screen_cam is not None and v0.shape[0] > 0:
        leaf_screen = _leaf_screen_boxes(v0, v1, v2, tri_valid, screen_cam,
                                         leaf, n_leaf)

    return _SceneArrays(
        scalars=scalars, tris=tris, boxT8=boxT8, sphs=sphs,
        sph_tile=sph_tile, n_leaf=n_leaf, scene_lo=scene_lo,
        scene_hi=scene_hi, perm_tri=perm_tri, leaf_screen=leaf_screen)


def tile_order(height: int, width: int, rows: int = 8, cols: int = 64):
    """Primary-ray permutation: row-major pixels → (rows x cols) 2D tile
    blocks (tile area = one 512-lane kernel block). Blocked camera frustums
    are ~2x tighter than pixel-row blocks (see module docstring).
    Returns None if the image doesn't tile evenly."""
    if height % rows or width % cols:
        return None
    ids = jnp.arange(height * width, dtype=jnp.int32).reshape(height, width)
    t = ids.reshape(height // rows, rows, width // cols, cols)
    return t.transpose(0, 2, 1, 3).reshape(-1)


def trace(key, o, d, packet, config, cull=True, record=False,
          interpret=False, tile_hint=None, leaf=_LEAF, lanes=None,
          screen_cam=None):
    """Wavefront trace: one sample per ray → linear color (R, 3).

    Bit-identical to `megakernel.trace_fused(key=...)` on the same scene
    (same threefry uniforms per original ray id; closest-hit is
    order-independent). With ``record=True`` also returns
    (sel (B, 4, R), urand (2B, R), tri_perm) in ORIGINAL ray order for the
    fused backward (`fused_grad`).

    ``tile_hint``: optional (H, W) — primary rays are additionally permuted
    into 2D pixel-tile blocks for the first bounce.
    ``screen_cam``: optional Camera. CONTRACT: (o, d) are this camera's
    jittered per-pixel rays in row-major pixel order (what
    `pathtracer.sample_image` passes). Bounce 0 then culls by SCREEN-SPACE
    binning — each pixel-tile block's candidate leaves are the ones whose
    projected bbox overlaps the tile (`_leaf_screen_boxes`) — instead of
    the 3D mask kernel; secondary bounces keep the 3D path. Conservative,
    so the image is unchanged (A/B'd bit-exact vs brute in
    tests/test_wavefront.py). Requires ``tile_hint``; ignored when the
    image doesn't tile evenly.
    ``cull=False`` sweeps every leaf (the brute A/B reference).
    """
    R = o.shape[0]
    B = config.max_depth
    if lanes is None:
        lanes = 128 if interpret else _LANES
    mats = pack_mats(packet.mat_kind, packet.mat_albedo, packet.mat_param)
    sky = jnp.concatenate(
        [packet.sky_bottom, packet.sky_top, jnp.zeros(2, jnp.float32)]
    ).astype(jnp.float32)

    prep = _prepare_scene(packet, config, leaf, screen_cam=screen_cam)
    scalars, tris, boxT8 = prep.scalars, prep.tris, prep.boxT8
    sphs, sph_tile, n_leaf = prep.sphs, prep.sph_tile, prep.n_leaf
    scene_lo, scene_hi, perm_tri = prep.scene_lo, prep.scene_hi, prep.perm_tri

    # state rows: 0-5 o d; 6-8 rgb; 9 active; 10 ORIGINAL ray id (f32 —
    # exact to 2^24 rays); 11 pad; 12..12+2B-1 this trace's scatter
    # uniforms. Ids and uniforms RIDE THE SORT: every per-bounce
    # permutation is then a single wide gather instead of gather-the-state
    # + gather-the-uniforms + gather-the-perm (measured ~5 ms/bounce of
    # separate (2, R)/(1, R) gathers at 512^2 — as much as the sort
    # itself). Padded rays are dead (active=0).
    r_pad = -(-R // lanes) * lanes
    nb = r_pad // lanes

    from ptre_tpu.ops.pallas.megakernel import _build_urand

    urand_orig = _build_urand(key, R, B)  # kept for record-mode return
    state = jnp.concatenate([
        o.T, d.T, jnp.ones((3, R), jnp.float32),
        jnp.ones((1, R), jnp.float32),
    ], axis=0)
    state = _pad_to(state, lanes, axis=1)
    state = jnp.concatenate([
        state,
        jnp.arange(r_pad, dtype=jnp.float32)[None, :],
        jnp.zeros((1, r_pad), jnp.float32),
        _pad_to(urand_orig, lanes, axis=1),
    ], axis=0)  # (12 + 2B, r_pad)

    screen_mask0 = None
    if tile_hint is not None:
        t_ord = tile_order(tile_hint[0], tile_hint[1], 8, lanes // 8)
        if t_ord is not None and t_ord.shape[0] == R:
            perm0 = jnp.concatenate(
                [t_ord, jnp.arange(R, r_pad, dtype=jnp.int32)])
            state = state[:, perm0]
            if (cull and prep.leaf_screen is not None and r_pad == R):
                # bounce-0 screen binning: block bi of the tile order IS
                # pixel tile (bi // n_tj, bi % n_tj); its candidate leaves
                # are a 2D bbox overlap — no mask kernel at bounce 0
                screen_mask0 = _screen_block_mask(
                    prep.leaf_screen, tile_hint[0], tile_hint[1], 8,
                    lanes // 8)

    def run_bounce(state, b):
        ur_b = state[12 + 2 * b:12 + 2 * b + 2]  # contiguous slice — free
        if b == 0 and screen_mask0 is not None:
            short, cnt = _shortlists_from_mask(screen_mask0, n_leaf)
        elif cull:
            # transposed state for the mask kernel (rays on sublanes)
            stateT = jnp.pad(state[:12].T, ((0, 0), (0, 4)))
            verd = _mask_call(scalars, stateT, boxT8, lanes=lanes,
                              interpret=interpret)
            short, cnt = _shortlists(verd, n_leaf)
        else:
            g = _SWEEP_GROUP
            npad = -(-n_leaf // g) * g
            row = jnp.concatenate([
                jnp.arange(n_leaf, dtype=jnp.int32),
                jnp.full((npad - n_leaf + g,), n_leaf, jnp.int32)])
            short = jnp.broadcast_to(row, (nb, 1, row.shape[0]))
            cnt = jnp.full((nb, 1, 1), npad, jnp.int32)
        out = _wave_call(
            scalars, sky, cnt, short, state[:12], ur_b, tris, sphs, mats,
            sph_tile=sph_tile, lanes=lanes, num_mats=packet.num_materials,
            record_sel=record, interpret=interpret, leaf=leaf)
        if record:
            # recorded selections RIDE THE STATE from here on: later
            # bounces' sort permutations carry them along, and ONE final
            # scatter returns everything to original ray order — the
            # round-4 per-bounce scatter_rows cost ~84 ms x bounce at
            # 1080p (record_fwd 1348 vs fwd 929 ms,
            # scripts/bench_wavefront_breakdown.py)
            out12, sel_b = out
            return jnp.concatenate([out12, state[12:], sel_b], axis=0)
        return jnp.concatenate([out, state[12:]], axis=0)

    def scatter_rows(state, rows):
        """Scatter sorted rows back to original ray order via the id row."""
        idx = state[10].astype(jnp.int32)
        return jnp.zeros((rows.shape[0], r_pad), jnp.float32).at[
            :, idx].set(rows)

    base_rows = 12 + 2 * B  # sel rows accumulate after these
    for b in range(B):
        if b > 0:
            n_live = jnp.sum(state[9, :] > 0.5)

            # sort live rays into coherent blocks; skip (lax.cond) once the
            # live fraction is too small to pay the sort's fixed cost.
            # (Round-5 A/B: 8-ray-group sort keys (_group_perm) cut the
            # argsort 8x but cost 2.5x MORE overall — the blocks span more
            # direction octants and the sweep pays ~200 ms/bounce extra
            # against the sort's 73 ms. Full per-ray sort kept.)
            def do_sort(state):
                keys = _coherence_key(state, scene_lo, scene_hi)
                p = jnp.argsort(keys, stable=True)
                return state[:, p]

            if (b - 1) % _SORT_EVERY == 0:
                state = jax.lax.cond(
                    n_live >= max(int(_SORT_MIN_LIVE * r_pad), 1),
                    do_sort, lambda s: s, state)

            # a fully-dead wavefront skips the whole bounce pipeline (mask +
            # compaction + kernel) — the XLA analogue of the megakernel's
            # all-dead `pl.when`
            def live_bounce(state):
                return run_bounce(state, b)

            def dead_bounce(state):
                if record:
                    return jnp.concatenate(
                        [state, jnp.zeros((4, r_pad), jnp.float32)], axis=0)
                return state

            state = jax.lax.cond(n_live > 0, live_bounce, dead_bounce, state)
        else:
            state = run_bounce(state, b)

    if not record:
        return scatter_rows(state, state[6:9, :])[:, :R].T

    # one scatter for color + every bounce's selections together
    packed = scatter_rows(state, jnp.concatenate(
        [state[6:9, :], state[base_rows:, :]], axis=0))[:, :R]
    color = packed[:3].T
    sel = packed[3:].reshape(B, 4, R)
    return color, sel, urand_orig, perm_tri
