"""Fully-fused forward+backward path gradients: one kernel each way.

Round-2's planar replay still paid an O(R*P) XLA toll per step: each bounce
materialized a (P, 8, L) one-hot in HBM, matmul'd it against the table to
build the (27*B, 8, L) winner rows `g`, ran the Pallas replay chain, and
transpose-matmul'd the cotangents back — ~6 GB/step of pure glue traffic at
1080p, and unscalable to triangle scenes (a 16k-row one-hot at 2M rays is
17 GB). This module deletes the glue:

  * **forward** = a recording fused trace (dense serial-sweep megakernel
    for reference-demo scenes; the sorted WAVEFRONT path,
    `ops.pallas.wavefront`, for triangle scenes — r4), recording only the
    per-bounce winner SELECTIONS (4 rows/bounce) — the color comes
    straight off the chip;
  * **backward** = ONE Pallas kernel: per ray block it re-GATHERS the winner
    rows from the VMEM-resident unified (P, 27) table with per-sublane
    one-hot MXU matmuls (per-tile `pl.when` skip — only tiles that contain
    some lane's winner are touched), recomputes the replay chain and
    reverses it in-register (`jax.vjp` inside the kernel body — in-kernel
    rematerialization), then transpose-SCATTERS the dg cotangents into a
    VMEM table-gradient accumulator with the same tiled one-hot matmuls.
    `g`/`dg` never touch HBM; the table gradient leaves the chip once,
    accumulated over the whole sequential grid.

Gradient semantics are identical to `ops.path_replay` (detached visibility:
selections are constants, gradients flow through the re-derived hit
geometry, materials, sky and camera rays); the chain is
`ops.pallas.replay_kernel._chain`, shared verbatim, so values and gradients
match the XLA replay to float tolerance (`tests/test_fused_grad.py`).

Reference parity contract as in `ops.path_replay` (`material.cu:5-62`,
`shape.cu:13-103`, `onb.h:7-21`, `random.cu:96-107`, sky at
`path_tracer.cu:307-316`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptre_tpu.ops.pallas import megakernel as mk
from ptre_tpu.ops.pallas import replay_kernel as rk
from ptre_tpu.utils.backend import is_tpu_backend

#: table tile width (lanes) for the gather/scatter one-hot matmuls; the
#: per-(tile, bounce) skip granularity
_TAB_TILE = 128
#: candidate ray-lane widths per backward block, widest first. The
#: segmented (per-bounce checkpointed) in-kernel vjp keeps one bounce's
#: chain live, so 256-384 lanes run spill-free (the r2/r3 monolithic vjp
#: spilled above 128 — measured 4x slower then); 512 exceeds the VMEM
#: block budget. Widest divisor wins: 439 -> 504 Mrays/s fwd+bwd at 1080p.
_BWD_LANES = (384, 256, 128)

_G_PAD = 32  # 27 g rows padded to the f32 sublane tile

#: VMEM budget for the backward kernel's resident state (table + gradient
#: accumulator + scratch), leaving headroom of the ~16 MiB VMEM for the ray
#: blocks and the in-kernel vjp's live values. `fits()` gates the fused
#: route on this — scenes above it take the staged path instead of risking
#: a Mosaic VMEM OOM at the top of `megakernel.supports()`'s range.
_BWD_VMEM_BUDGET = 12 * 1024 * 1024


def _bwd_resident_bytes(n_rows: int, max_depth: int = 5) -> int:
    """Resident VMEM bytes of the backward kernel for a unified table of
    ``n_rows`` primitives: table + gradient accumulator (both
    (n_tiles, 32, _TAB_TILE) f32) + the per-(bounce, sublane) g scratch."""
    n_tiles = -(-n_rows // _TAB_TILE)
    table_bytes = n_tiles * _G_PAD * _TAB_TILE * 4
    g_scr_bytes = max_depth * 8 * _G_PAD * max(_BWD_LANES) * 4
    return 2 * table_bytes + g_scr_bytes


def fits(packet, max_depth: int = 5) -> bool:
    """Whether the fused backward kernel's resident state fits the VMEM
    budget for this packet (callers fall back to the staged path)."""
    n_rows = int(packet.tri_valid.shape[0]) + int(packet.sph_center.shape[0])
    return _bwd_resident_bytes(n_rows, max_depth) <= _BWD_VMEM_BUDGET


def _pack_table3(table, tile=_TAB_TILE):
    """(P, 27) unified table → (n_tiles, 32, tile) transposed-tiled VMEM
    layout: table3[jt, c, j] = table[jt*tile + j, c]. The transpose keeps
    the long primitive axis on lanes (a (16k, 32) layout would pad 32 → 128
    lanes and waste 4x VMEM)."""
    P, C = table.shape
    tT = jnp.pad(table.T, ((0, _G_PAD - C), (0, (-P) % tile)))
    n_tiles = tT.shape[1] // tile
    return tT.reshape(_G_PAD, n_tiles, tile).transpose(1, 0, 2)


def _unpack_dtable3(dtab3, P, C=27):
    """Inverse of `_pack_table3` for the gradient accumulator."""
    n_tiles, _, tile = dtab3.shape
    tT = dtab3.transpose(1, 0, 2).reshape(_G_PAD, n_tiles * tile)
    return tT[:C, :P].T


def _pack_rays_planar(o, d, Ltot):
    """(R, 3) o/d → (8, 8, Ltot) planar rays (r = sublane*Ltot + lane)."""
    R = o.shape[0]
    rows = jnp.concatenate([o.T, d.T, jnp.zeros((2, R), jnp.float32)])
    rows = jnp.pad(rows, ((0, 0), (0, 8 * Ltot - R)))
    return rows.reshape(8, 8, Ltot)


def _fused_bwd_kernel(
    sky_ref,  # SMEM f32 (8,): sky_bottom.rgb, sky_top.rgb, pad
    tab_ref,  # VMEM (n_tiles, 32, tile) resident: _pack_table3 layout
    rays_ref,  # (8, 8, L) block: o.xyz d.xyz pad pad, planar
    sel_ref,  # (4B, 8, L) block: tri idx, sph idx, use_sph, hit per bounce
    ur_ref,  # (2B, 8, L) block: scatter uniforms
    dcol_ref,  # (4, 8, L) block: color cotangent (row 3 pad)
    drays_ref,  # (8, 8, L) block out
    dtab_ref,  # VMEM (n_tiles, 32, tile) out, accumulated across the grid
    dsky_ref,  # (8, 8, L) out, accumulated across the grid
    g_scr,  # VMEM (B*8, 32, L) scratch: per-(bounce, sublane) g/dg rows
    *,
    max_depth: int,
    t_min: float,
    shadow_eps: float,
    pdf_eps: float,
    tri_rows: int,  # sphere-row offset in the unified table
    n_rays: int,  # true ray count (valid-lane mask)
    l_total: int,  # planar L of the whole batch
):
    i = pl.program_id(0)
    B = max_depth

    @pl.when(i == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)
        dsky_ref[...] = jnp.zeros_like(dsky_ref)

    L = rays_ref.shape[2]
    n_tiles = tab_ref.shape[0]
    tile = tab_ref.shape[2]
    shape = (8, L)

    o = [rays_ref[c] for c in range(3)]
    d = [rays_ref[c + 3] for c in range(3)]

    # valid-lane mask: planar ray id = sublane*l_total + block offset + lane
    sub_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    valid = (sub_i * l_total + i * L + lane_i) < n_rays
    validf = valid.astype(jnp.float32)

    # per-bounce unified winner index; dead/padded lanes get -1 (matches no
    # tile row, so they neither gather nor scatter — the round-2 padded-lane
    # NaN-poisoning class is structurally impossible here)
    idxs, flags, urand = [], [], []
    for b in range(B):
        # mask BOTH flags with validf (matching `_replay_pallas_planar`):
        # padded/invalid lanes must read as miss everywhere in the chain,
        # not just in hitf — a raw use_sph row on a dead lane is a latent
        # NaN hazard if the chain guards ever change
        use_sphf = sel_ref[4 * b + 2] * validf
        hitf = sel_ref[4 * b + 3] * validf
        idx = jnp.where(use_sphf > 0.5,
                        jnp.float32(tri_rows) + sel_ref[4 * b + 1],
                        sel_ref[4 * b + 0])
        idxs.append(jnp.where(hitf > 0.5, idx, -1.0))
        flags.append((use_sphf, hitf))
        urand.append((ur_ref[2 * b], ur_ref[2 * b + 1]))

    lane_f = jax.lax.broadcasted_iota(jnp.int32, (tile, L), 0).astype(
        jnp.float32)
    # small tables: unroll the tile loop (no fori/when overhead — measured
    # 12.6 -> 8.3 ms at 1080p for the single-tile demo table)
    unroll = n_tiles <= 4

    # ---- gather winner rows g from the resident table ---------------------
    g_scr[...] = jnp.zeros_like(g_scr)

    def gather_tile(jt, basef):
        blk = tab_ref[jt]  # (32, tile)
        for b in range(B):
            def work(b=b):
                for s in range(8):
                    oh = ((lane_f + basef) == idxs[b][s:s + 1, :]).astype(
                        jnp.float32)  # (tile, L)
                    g_scr[b * 8 + s] = g_scr[b * 8 + s] + jax.lax.dot_general(
                        blk, oh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (32, L)

            if n_tiles == 1:
                work()
            else:
                in_t = (idxs[b] >= basef) & (idxs[b] < basef + tile)
                pl.when(jnp.max(in_t.astype(jnp.float32)) > 0.5)(work)

    if unroll:
        for jt in range(n_tiles):
            gather_tile(jt, jnp.float32(jt * tile))
    else:
        jax.lax.fori_loop(
            0, n_tiles,
            lambda jt, c: (gather_tile(jt, (jt * tile).astype(jnp.float32)),
                           c)[1], 0)

    g = [
        [
            jnp.concatenate(
                [g_scr[b * 8 + s, k:k + 1, :] for s in range(8)], axis=0)
            for k in range(rk.G_ROWS)
        ]
        for b in range(B)
    ]

    # ---- segmented in-kernel vjp of the shared replay chain ---------------
    # per-bounce jax.vjp against SAVED bounce-boundary states (in-kernel
    # checkpointing): the monolithic whole-chain vjp keeps all 5 bounces'
    # intermediates live, which spills vector registers above 128 lanes
    # (r3 measured 4x slower at 256); bounding liveness to one bounce's
    # chain lets wider blocks run spill-free. Each bounce's forward is
    # recomputed once inside its vjp — ~1x extra chain FLOPs for ~5x less
    # live state.
    sky_blk = tuple(
        jnp.full(shape, sky_ref[k], jnp.float32) for k in range(6))

    one = jnp.ones(shape, jnp.float32)
    st = (tuple(o), tuple(d), (one, one, one))
    act = one > 0.0
    states = [(st, act)]
    for b in range(B):
        o_b, d_b, c_b, act = rk._chain_bounce(
            st[0], st[1], st[2], act, g[b], flags[b], urand[b], sky_blk,
            t_min=t_min, shadow_eps=shadow_eps, pdf_eps=pdf_eps)
        st = (o_b, d_b, c_b)
        states.append((st, act))

    zero3 = (jnp.zeros(shape, jnp.float32),) * 3
    d_o, d_d = zero3, zero3
    d_c = (dcol_ref[0], dcol_ref[1], dcol_ref[2])
    dg = [None] * B
    dsky = (jnp.zeros(shape, jnp.float32),) * 6
    for b in reversed(range(B)):
        (o_b, d_b, c_b), act_b = states[b]

        def fb(o_, d_, c_, gb_, sky_, b=b, act_b=act_b):
            o2, d2, c2, _ = rk._chain_bounce(
                o_, d_, c_, act_b, gb_, flags[b], urand[b], sky_,
                t_min=t_min, shadow_eps=shadow_eps, pdf_eps=pdf_eps)
            return o2, d2, c2

        _, vjpb = jax.vjp(fb, o_b, d_b, c_b, g[b], sky_blk)
        d_o, d_d, d_c, dg_b, dsky_b = vjpb((d_o, d_d, d_c))
        dg[b] = dg_b
        dsky = tuple(a + bk for a, bk in zip(dsky, dsky_b))
    do, dd = d_o, d_d

    for c in range(3):
        drays_ref[c] = do[c]
        drays_ref[c + 3] = dd[c]
    drays_ref[6] = jnp.zeros(shape, jnp.float32)
    drays_ref[7] = jnp.zeros(shape, jnp.float32)
    for k in range(6):
        dsky_ref[k] = dsky_ref[k] + dsky[k]

    # ---- transpose-scatter dg into the table-gradient accumulator ---------
    zpad = jnp.zeros((_G_PAD - rk.G_ROWS, L), jnp.float32)
    for b in range(B):
        for s in range(8):
            g_scr[b * 8 + s] = jnp.concatenate(
                [dg[b][k][s:s + 1, :] for k in range(rk.G_ROWS)] + [zpad],
                axis=0)  # (32, L)

    def scatter_tile(jt, basef):
        for b in range(B):
            def work(b=b):
                for s in range(8):
                    oh = ((lane_f + basef) == idxs[b][s:s + 1, :]).astype(
                        jnp.float32)  # (tile, L)
                    dtab_ref[jt] = dtab_ref[jt] + jax.lax.dot_general(
                        g_scr[b * 8 + s], oh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (32, tile)

            if n_tiles == 1:
                work()
            else:
                in_t = (idxs[b] >= basef) & (idxs[b] < basef + tile)
                pl.when(jnp.max(in_t.astype(jnp.float32)) > 0.5)(work)

    if unroll:
        for jt in range(n_tiles):
            scatter_tile(jt, jnp.float32(jt * tile))
    else:
        jax.lax.fori_loop(
            0, n_tiles,
            lambda jt, c: (scatter_tile(jt, (jt * tile).astype(jnp.float32)),
                           c)[1], 0)


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "t_min", "shadow_eps", "pdf_eps",
                     "tri_rows", "n_rays", "lanes", "interpret"))
def _fused_bwd_call(sky, tab3, rays, sel, urand, dcol, *, max_depth, t_min,
                    shadow_eps, pdf_eps, tri_rows, n_rays, lanes, interpret):
    Ltot = rays.shape[2]
    B = max_depth
    n_tiles, _, tile = tab3.shape
    grid = (Ltot // lanes,)

    def blk(rows):
        return pl.BlockSpec((rows, 8, lanes), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, max_depth=B, t_min=t_min,
            shadow_eps=shadow_eps, pdf_eps=pdf_eps, tri_rows=tri_rows,
            n_rays=n_rays, l_total=Ltot),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            blk(8),
            blk(4 * B),
            blk(2 * B),
            blk(4),
        ],
        out_specs=[
            blk(8),
            pl.BlockSpec((n_tiles, _G_PAD, tile), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8, lanes), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 8, Ltot), jnp.float32),
            jax.ShapeDtypeStruct(tab3.shape, jnp.float32),
            jax.ShapeDtypeStruct((8, 8, lanes), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B * 8, _G_PAD, lanes), jnp.float32)],
        interpret=interpret,
    )(sky, tab3, rays, sel, urand, dcol)


@functools.lru_cache(maxsize=None)
def _make_core(max_depth, t_min, shadow_eps, pdf_eps, tri_rows, n_rays,
               lanes, interpret):
    """custom_vjp core over (table, sky6, rays_p): primal color is computed
    out-of-band by the recording megakernel and passed through; backward is
    the single fused kernel above."""
    kw = dict(max_depth=max_depth, t_min=t_min, shadow_eps=shadow_eps,
              pdf_eps=pdf_eps, tri_rows=tri_rows, n_rays=n_rays, lanes=lanes,
              interpret=interpret)

    @jax.custom_vjp
    def core(table, sky6, rays_p, sel_p, urand_p, color):
        return color

    def fwd(table, sky6, rays_p, sel_p, urand_p, color):
        return color, (table, sky6, rays_p, sel_p, urand_p)

    def bwd(res, dcolor):
        table, sky6, rays_p, sel_p, urand_p = res
        Ltot = rays_p.shape[2]
        dcol = jnp.pad(dcolor.T, ((0, 1), (0, 8 * Ltot - n_rays)))
        dcol = dcol.reshape(4, 8, Ltot)
        tab3 = _pack_table3(jax.lax.stop_gradient(table))
        sky = jnp.pad(sky6, (0, 2))
        drays, dtab3, dsky_blk = _fused_bwd_call(
            sky, tab3, rays_p, sel_p, urand_p, dcol, **kw)
        dtable = _unpack_dtable3(dtab3, table.shape[0])
        dsky6 = jnp.sum(dsky_blk, axis=(1, 2))[:6]
        return (dtable, dsky6, drays, jnp.zeros_like(sel_p),
                jnp.zeros_like(urand_p), jnp.zeros_like(dcolor))

    core.defvjp(fwd, bwd)
    return core


def trace_grad(key, o, d, packet, config, interpret=None, force=None,
               screen_cam=None):
    """Differentiable fused trace → linear color (R, 3).

    Drop-in replacement for `integrator.trace` wherever the megakernel
    `supports()` the scene: dense serial-sweep forward for reference-demo
    scenes (<= 64 primitives), culled lane-parallel forward for triangle
    scenes (BASELINE configs 3-4). Gradients w.r.t. transforms, geometry,
    materials, sky (through the unified table) and the primary rays
    (→ camera) — same detached-visibility estimator as `ops.path_replay`,
    with both the O(R*P) sweep AND the entire backward chain fused on-chip.

    ``force``: None (auto: dense when supported, else the sorted wavefront
    forward), "dense", "wavefront", "culled" (megakernel lane-parallel,
    kept for A/B), or "uncull" (lane-parallel with culling off — brute
    reference).
    ``screen_cam``: optional Camera whose jittered pixel rays (o, d) are,
    in row-major order — enables the wavefront forward's bounce-0
    screen-space binning (see `wavefront.trace`). Detached: culling is
    discrete, so no gradient flows through the camera via this hint.
    """
    from ptre_tpu.ops.path_replay import _build_table

    if interpret is None:
        interpret = not is_tpu_backend()
    sg = jax.lax.stop_gradient
    pkt_d = jax.tree.map(sg, packet)
    R = o.shape[0]
    B = config.max_depth

    dense = mk.dense_supported(packet) if force is None else (force == "dense")
    if dense:
        color, sel_p, urand_p = mk.trace_fused_sel(
            key, sg(o), sg(d), pkt_d, config, interpret=interpret,
            planar="color", hw_rng=not interpret)
        perm = None
    elif force in ("culled", "uncull"):
        color, sel_p, urand_p, perm = mk.trace_culled_sel(
            key, sg(o), sg(d), pkt_d, config, cull=(force != "uncull"),
            interpret=interpret)
    else:
        # triangle-scale production forward: the sorted wavefront trace
        # (ops.pallas.wavefront) recording per-bounce selections in
        # original ray order; repack flat rows into the planar layout the
        # fused backward consumes
        from ptre_tpu.ops.pallas import wavefront as wf

        hint = None
        scam = None
        if screen_cam is not None and R == config.width * config.height:
            hint = (config.height, config.width)
            scam = jax.tree.map(sg, screen_cam)
        color, sel, urand, perm = wf.trace(
            key, sg(o), sg(d), pkt_d, config, record=True,
            interpret=interpret, tile_hint=hint, screen_cam=scam)
        # pad to the lane-width LCM so the widest backward block divides
        block = 8 * 768
        sel_p = mk._pad_to(sel.reshape(4 * B, R), block, axis=1)
        sel_p = sel_p.reshape(4 * B, 8, sel_p.shape[1] // 8)
        urand_p = mk._pad_to(urand, block, axis=1)
        urand_p = urand_p.reshape(2 * B, 8, urand_p.shape[1] // 8)

    table, T, sky6 = _build_table(packet)
    if perm is not None:
        # recorded tri indices refer to the Morton-permuted rows; permute the
        # differentiable table to match (gradients flow back through the
        # gather's transpose automatically)
        table = jnp.concatenate([table[:T][perm], table[T:]], axis=0)

    Ltot = sel_p.shape[2]
    rays_p = _pack_rays_planar(o, d, Ltot)
    # Lane-width cap at triangle scale x megapixel rays: with a multi-tile
    # table AND a megapixel grid the 384-lane backward's Mosaic stack
    # exceeds the 16 MiB scoped-vmem limit (measured +912 KiB at the
    # 128-tile config-4 table, 1080p — while the same table at 512^2 and
    # the demo table at 1080p both compile fine at 384). 256 lanes fits
    # and beats 128 there (6.60 vs 5.91 Mrays/s fwd+vjp, round 5).
    n_tab_tiles = -(-table.shape[0] // _TAB_TILE)
    cands = _BWD_LANES
    if n_tab_tiles > 4 and Ltot > 65536:
        cands = tuple(c for c in _BWD_LANES if c <= 256)
    lanes = next(c for c in cands if Ltot % c == 0)
    core = _make_core(config.max_depth, float(config.t_min),
                      float(config.shadow_eps), float(config.pdf_eps),
                      int(T), int(R), lanes, bool(interpret))
    return core(table, sky6, rays_p, sel_p, urand_p, color)
