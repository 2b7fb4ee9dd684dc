"""Differentiable (SoftRas) rasterizer as Pallas TPU kernels, custom VJP.

The XLA soft path (`render.rasterizer._raster_tile(soft=True)`) materializes
the full (pixels x triangles) coverage/softmax tensors — 1.7 s/frame at
720p ss=2 (round-3 VERDICT missing #1). This module keeps the same math —
sigmoid coverage on signed edge distance, softmax-in-depth blending, HLSL
shading (`rasterizer.cu:36-169` + both HLSL shaders, differentiably) — but
streams it:

  * forward: pixel tiles on the grid (8 rows x lanes, like
    `raster_kernel`), the triangle table VMEM-resident, chunks gated by
    DILATED screen bboxes. The softmax over triangles is computed ONLINE
    (flash-attention style): per pixel the kernel carries the running
    (max-logit m, denominator D, coverage-weight sum W, color numerator N)
    and rescales on max updates — no (P x T) tensor ever exists.
    Skipping far pairs is EXACT, not approximate: pairs with cov <= 1e-6
    get logit -1e9 in the reference formula, contributing exactly zero
    weight AND zero denominator mass, and the bbox dilation (14 sigma) is
    chosen so every skipped pair is in that branch;
  * backward: ONE kernel pass re-walks the same chunks, recomputes each
    pair's (coverage, logit, color) with `jax.vjp` traced INSIDE the
    kernel (in-kernel remat — the `replay_kernel` trick), feeds it the
    softmax-layer cotangents derived from the saved per-pixel (m, D, W, N)
    residuals, and accumulates the table gradient across the sequential
    grid. The table -> (transforms, camera) chain stays in XLA autodiff
    (`pack_raster_tris` is ordinary differentiable JAX).

Supports the row-sharded window form (`y0`, `stride`) so
`parallel.sharding.shard_raster_step(soft=True)` / `dual_train_step` can
run it per chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptre_tpu.ops.pallas.raster_kernel import (
    _SUB, _TRI_CHUNK, _lanes_for_width, pack_raster_tris,
)

_BIG = 3e38
#: bbox dilation in sigmas: sigmoid(-14) < 1e-6, the reference's own
#: cov-threshold branch — pairs beyond this are EXACT zeros (see module doc)
_DILATE_SIGMA = 14.0
#: depth softmax temperature (reference `rasterizer.py` logits = -z/0.01)
_INV_TAU = 100.0


def supports(config) -> bool:
    ss = config.supersample
    return ((config.height * ss) % _SUB == 0
            and _lanes_for_width(config.width * ss) > 0)


def _soft_cols(packet, cam, config):
    """`pack_raster_tris` table + per-edge inverse squared lengths in the
    spare cols 27-29 (saves 3 divisions per (pixel, triangle) pair), plus
    the chunk bbox table dilated by 14 sigma * sqrt2."""
    cols, cbox = pack_raster_tris(packet, cam, config)

    def inv_len2(xa, ya, xb, yb):
        ex, ey = cols[:, xb] - cols[:, xa], cols[:, yb] - cols[:, ya]
        return 1.0 / (ex * ex + ey * ey + 1e-12)

    cols = cols.at[:, 27].set(inv_len2(0, 1, 2, 3))
    cols = cols.at[:, 28].set(inv_len2(2, 3, 4, 5))
    cols = cols.at[:, 29].set(inv_len2(4, 5, 0, 1))
    return cols, cbox


def _pair_terms(blk, px, py_r, scal):
    """Per-(triangle-sublane, pixel-lane) soft-raster terms for one 8-row
    triangle group against one pixel row.

    Returns (cov, logit, c_r, c_g, c_b); written as a pure function of
    ``blk`` so the backward kernel can `jax.vjp` it in-register.
    """
    sigma_inv = scal[12]
    c = lambda col: blk[:, col:col + 1]  # (8, 1)
    w0 = ((c(2) - px) * (c(5) - py_r) - (c(4) - px) * (c(3) - py_r)) * c(22)
    w1 = ((c(4) - px) * (c(1) - py_r) - (c(0) - px) * (c(5) - py_r)) * c(22)
    w2 = 1.0 - w0 - w1
    z = w0 * c(6) + w1 * c(7) + w2 * c(8)
    z_ok = ((z >= 0.0) & (z <= 1.0)).astype(jnp.float32)
    keep = c(12)

    def edge_dist(xa, ya, xb, yb, ilen):
        ax, ay = c(xa), c(ya)
        ex, ey = c(xb) - ax, c(yb) - ay
        t = ((px - ax) * ex + (py_r - ay) * ey) * c(ilen)
        t = jnp.clip(t, 0.0, 1.0)
        cx = ax + t * ex
        cy = ay + t * ey
        return jnp.sqrt((px - cx) ** 2 + (py_r - cy) ** 2 + 1e-12)

    d01 = edge_dist(0, 1, 2, 3, 27)
    d12 = edge_dist(2, 3, 4, 5, 28)
    d20 = edge_dist(4, 5, 0, 1, 29)
    dist = jnp.minimum(d01, jnp.minimum(d12, d20))
    inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
    signed = jnp.where(inside, dist, -dist)
    # stable sigmoid (the reference's jax.nn.sigmoid): the naive
    # 1/(1+exp(-x)) overflows for far pixels inside dilated chunks and
    # NaN-poisons the in-kernel vjp jacobian
    cov = keep * z_ok * jax.nn.sigmoid(signed * sigma_inv)

    zc = jnp.clip(z, 0.0, 1.0)
    logit = -zc * _INV_TAU

    # perspective-correct normal -> HLSL ambient+diffuse shade
    den = w0 * c(9) + w1 * c(10) + w2 * c(11)
    inv_den = 1.0 / jnp.where(den == 0.0, 1.0, den)
    nx = (w0 * c(13) + w1 * c(16) + w2 * c(19)) * inv_den
    ny = (w0 * c(14) + w1 * c(17) + w2 * c(20)) * inv_den
    nz = (w0 * c(15) + w1 * c(18) + w2 * c(21)) * inv_den
    nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz + 1e-20)
    ninv = 1.0 / nlen
    nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
    diffuse = jnp.maximum(
        -(nx * scal[6] + ny * scal[7] + nz * scal[8]), 0.0)
    c_r = (scal[0] + diffuse) * scal[3]
    c_g = (scal[1] + diffuse) * scal[4]
    c_b = (scal[2] + diffuse) * scal[5]
    return cov, logit, c_r, c_g, c_b


def _row_y(i, r, scal, ss):
    """Supersampled y coordinate of local row i*8+r under the (y0, stride)
    output-row window (ss is static)."""
    idx = i * _SUB + r
    out_local = idx // ss
    sub = idx % ss
    y0 = scal[13]
    stride = scal[14]
    return (y0 + stride * out_local.astype(jnp.float32)) * float(ss) \
        + sub.astype(jnp.float32) + 0.5


def _soft_fwd_kernel(
    scal_ref,  # SMEM f32 (16,): ambient rgb, albedo rgb, light xyz, clear
    #            rgb, sigma_inv(12), y0(13), stride(14), pad
    cbox_ref,  # SMEX f32 (n_chunks, 8): DILATED chunk bboxes + any-keep
    tri_ref,  # VMEM (T_pad, 32) resident soft table
    img_ref,  # (3, 8, lanes) out
    res_ref,  # (8, 8, lanes) out: m, D, W, Nr, Ng, Nb, pad, pad
    m_ref, d_ref, w_ref, nr_ref, ng_ref, nb_ref,  # (8, lanes) scratch
    *,
    lanes: int,
    ss: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_chunks = cbox_ref.shape[0]
    n_groups = _TRI_CHUNK // _SUB
    scal = [scal_ref[k] for k in range(16)]

    m_ref[...] = jnp.full((_SUB, lanes), -_BIG, jnp.float32)
    d_ref[...] = jnp.zeros((_SUB, lanes), jnp.float32)
    w_ref[...] = jnp.zeros((_SUB, lanes), jnp.float32)
    nr_ref[...] = jnp.zeros((_SUB, lanes), jnp.float32)
    ng_ref[...] = jnp.zeros((_SUB, lanes), jnp.float32)
    nb_ref[...] = jnp.zeros((_SUB, lanes), jnp.float32)

    tx0 = (j * lanes).astype(jnp.float32)
    tx1 = tx0 + float(lanes)
    px = tx0 + jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1).astype(
        jnp.float32) + 0.5

    # this tile's supersampled y range (strided windows are monotone in y)
    ty0 = _row_y(i, 0, scal, ss)
    ty1 = _row_y(i, _SUB - 1, scal, ss) + 0.5

    def chunk_body(k, carry):
        chunk_hit = (
            (cbox_ref[k, 4] > 0.5)
            & (cbox_ref[k, 0] < tx1) & (cbox_ref[k, 1] >= tx0)
            & (cbox_ref[k, 2] < ty1 + 0.5) & (cbox_ref[k, 3] >= ty0 - 0.5)
        )

        @pl.when(chunk_hit)
        def _():
            blk_all = tri_ref[pl.dslice(k * _TRI_CHUNK, _TRI_CHUNK), :]
            for r in range(_SUB):
                py_r = _row_y(i, r, scal, ss)
                # chunk-local online-softmax state in registers
                mc = m_ref[r:r + 1, :]
                dc = d_ref[r:r + 1, :]
                wc = w_ref[r:r + 1, :]
                nrc = nr_ref[r:r + 1, :]
                ngc = ng_ref[r:r + 1, :]
                nbc = nb_ref[r:r + 1, :]
                for g in range(n_groups):
                    blk = blk_all[g * _SUB:(g + 1) * _SUB, :]
                    cov, logit, c_r, c_g, c_b = _pair_terms(
                        blk, px, py_r, scal)
                    inc = cov > 1e-6
                    lm = jnp.where(inc, logit, -_BIG)
                    gm = jnp.max(lm, axis=0, keepdims=True)
                    m_new = jnp.maximum(mc, gm)
                    # rescale old state; exp(-BIG - m) underflows to 0 only
                    # if m_new is finite — guard the empty case
                    scale = jnp.exp(
                        jnp.maximum(mc - m_new, -_BIG * 0.5)
                    ) * (mc > -_BIG * 0.5).astype(jnp.float32)
                    e = jnp.where(inc, jnp.exp(lm - m_new), 0.0)
                    ce = cov * e
                    dc = dc * scale + jnp.sum(e, axis=0, keepdims=True)
                    wc = wc * scale + jnp.sum(ce, axis=0, keepdims=True)
                    nrc = nrc * scale + jnp.sum(ce * c_r, axis=0,
                                                keepdims=True)
                    ngc = ngc * scale + jnp.sum(ce * c_g, axis=0,
                                                keepdims=True)
                    nbc = nbc * scale + jnp.sum(ce * c_b, axis=0,
                                                keepdims=True)
                    mc = m_new
                m_ref[r:r + 1, :] = mc
                d_ref[r:r + 1, :] = dc
                w_ref[r:r + 1, :] = wc
                nr_ref[r:r + 1, :] = nrc
                ng_ref[r:r + 1, :] = ngc
                nb_ref[r:r + 1, :] = nbc

        return carry

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    m = m_ref[...]
    D = d_ref[...]
    W = w_ref[...]
    inv_d = jnp.where(D > 0.0, 1.0 / jnp.where(D > 0.0, D, 1.0), 0.0)
    s = W * inv_d
    bg = jnp.maximum(0.0, 1.0 - s)
    img_ref[0] = nr_ref[...] * inv_d + bg * scal_ref[9]
    img_ref[1] = ng_ref[...] * inv_d + bg * scal_ref[10]
    img_ref[2] = nb_ref[...] * inv_d + bg * scal_ref[11]
    res_ref[0] = m
    res_ref[1] = D
    res_ref[2] = W
    res_ref[3] = nr_ref[...]
    res_ref[4] = ng_ref[...]
    res_ref[5] = nb_ref[...]
    res_ref[6] = jnp.zeros((_SUB, lanes), jnp.float32)
    res_ref[7] = jnp.zeros((_SUB, lanes), jnp.float32)


def _soft_bwd_kernel(
    scal_ref,  # SMEM (16,)
    cbox_ref,  # SMEM (n_chunks, 8) dilated
    tri_ref,  # VMEM (T_pad, 32)
    res_ref,  # (8, 8, lanes) block: saved m, D, W, Nr, Ng, Nb
    dimg_ref,  # (3, 8, lanes) block: image cotangent
    dtab_ref,  # VMEM (T_pad, 32) out, accumulated across the grid
    *,
    lanes: int,
    ss: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_chunks = cbox_ref.shape[0]
    n_groups = _TRI_CHUNK // _SUB
    scal = [scal_ref[k] for k in range(16)]

    @pl.when((i == 0) & (j == 0))
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    tx0 = (j * lanes).astype(jnp.float32)
    tx1 = tx0 + float(lanes)
    px = tx0 + jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1).astype(
        jnp.float32) + 0.5
    ty0 = _row_y(i, 0, scal, ss)
    ty1 = _row_y(i, _SUB - 1, scal, ss) + 0.5

    def chunk_body(k, carry):
        chunk_hit = (
            (cbox_ref[k, 4] > 0.5)
            & (cbox_ref[k, 0] < tx1) & (cbox_ref[k, 1] >= tx0)
            & (cbox_ref[k, 2] < ty1 + 0.5) & (cbox_ref[k, 3] >= ty0 - 0.5)
        )

        @pl.when(chunk_hit)
        def _():
            base = k * _TRI_CHUNK
            # hoist the per-pixel-row residual terms out of the group loop
            row_st = []
            for r in range(_SUB):
                m = res_ref[0, r:r + 1, :]
                D = res_ref[1, r:r + 1, :]
                W = res_ref[2, r:r + 1, :]
                nr = res_ref[3, r:r + 1, :]
                ng = res_ref[4, r:r + 1, :]
                nb = res_ref[5, r:r + 1, :]
                gr = dimg_ref[0, r:r + 1, :]
                gg = dimg_ref[1, r:r + 1, :]
                gb = dimg_ref[2, r:r + 1, :]
                inv_d = jnp.where(D > 0.0,
                                  1.0 / jnp.where(D > 0.0, D, 1.0), 0.0)
                s = W * inv_d
                live_bg = (s < 1.0).astype(jnp.float32)
                g_clear = (gr * scal[9] + gg * scal[10]
                           + gb * scal[11]) * live_bg
                # dout . out_soft, precomputed per row
                g_out = (gr * nr + gg * ng + gb * nb) * inv_d
                row_st.append((_row_y(i, r, scal, ss), m, inv_d, s,
                               g_clear, g_out, gr, gg, gb))

            # group loop OUTER, rows inner: the table-gradient accumulation
            # sums the 8 pixel rows' dblk in registers and does ONE VMEM
            # read-modify-write per triangle group (was 8 — the RMW chain
            # serialized the whole inner loop; round-5, directive #5)
            for g in range(n_groups):
                rows = pl.dslice(base + g * _SUB, _SUB)
                blk = tri_ref[rows, :]
                dacc = jnp.zeros((_SUB, blk.shape[1]), jnp.float32)
                for r in range(_SUB):
                    (py_r, m, inv_d, s, g_clear, g_out, gr, gg,
                     gb) = row_st[r]

                    def f(b, py_r=py_r):
                        return _pair_terms(b, px, py_r, scal)

                    (cov, logit, c_r, c_g, c_b), vjp = jax.vjp(f, blk)
                    inc = (cov > 1e-6).astype(jnp.float32)
                    e = inc * jnp.exp(
                        jnp.minimum(logit - m, 0.0))  # exp(l - m), 0 if far
                    p = e * inv_d
                    gc = gr * c_r + gg * c_g + gb * c_b  # dout . c_i
                    dl = p * (cov * gc - g_out) - g_clear * p * (cov - s)
                    dcov = p * gc - g_clear * p
                    w_i = cov * p
                    (dblk,) = vjp((dcov, dl, w_i * gr, w_i * gg, w_i * gb))
                    dacc = dacc + dblk
                dtab_ref[rows, :] = dtab_ref[rows, :] + dacc

        return carry

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def _specs(lanes, n_rows):
    return pl.BlockSpec((n_rows, _SUB, lanes), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)


@functools.partial(
    jax.jit, static_argnames=("h_ss", "w_ss", "lanes", "ss", "interpret"))
def _soft_fwd_call(scalars, cbox, tris, h_ss, w_ss, lanes, ss,
                   interpret=False):
    return pl.pallas_call(
        functools.partial(_soft_fwd_kernel, lanes=lanes, ss=ss),
        grid=(h_ss // _SUB, w_ss // lanes),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[_specs(lanes, 3), _specs(lanes, 8)],
        out_shape=[
            jax.ShapeDtypeStruct((3, h_ss, w_ss), jnp.float32),
            jax.ShapeDtypeStruct((8, h_ss, w_ss), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_SUB, lanes), jnp.float32)] * 6,
        interpret=interpret,
    )(scalars, cbox, tris)


@functools.partial(
    jax.jit, static_argnames=("h_ss", "w_ss", "lanes", "ss", "interpret"))
def _soft_bwd_call(scalars, cbox, tris, resid, dimg, h_ss, w_ss, lanes, ss,
                   interpret=False):
    return pl.pallas_call(
        functools.partial(_soft_bwd_kernel, lanes=lanes, ss=ss),
        grid=(h_ss // _SUB, w_ss // lanes),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _specs(lanes, 8),
            _specs(lanes, 3),
        ],
        out_specs=pl.BlockSpec(tris.shape, lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(tris.shape, jnp.float32),
        interpret=interpret,
    )(scalars, cbox, tris, resid, dimg)


@functools.lru_cache(maxsize=None)
def _make_core(h_ss, w_ss, lanes, ss, interpret):
    """custom_vjp over the packed table: img_p (3, h_ss, w_ss) = core(cols,
    cbox, scalars); backward = the single in-kernel-remat pass."""

    @jax.custom_vjp
    def core(cols, cbox, scalars):
        img, _ = _soft_fwd_call(scalars, cbox, cols, h_ss, w_ss, lanes, ss,
                                interpret=interpret)
        return img

    def fwd(cols, cbox, scalars):
        img, resid = _soft_fwd_call(scalars, cbox, cols, h_ss, w_ss, lanes,
                                    ss, interpret=interpret)
        return img, (cols, cbox, scalars, resid)

    def bwd(res, dimg):
        cols, cbox, scalars, resid = res
        dcols = _soft_bwd_call(scalars, cbox, cols, resid, dimg, h_ss, w_ss,
                               lanes, ss, interpret=interpret)
        return dcols, None, None

    core.defvjp(fwd, bwd)
    return core


def rasterize_soft_fused(packet, cam, config, sigma=0.5, y0=0.0, stride=1,
                         rows=None, interpret=False):
    """Differentiable SoftRas rasterize → (rows, W, 3), resolved.

    Drop-in for `render.rasterizer.raster_rows(soft=True)` (same math, see
    module docstring); gradients w.r.t. packet transforms/geometry and the
    camera flow through the XLA vertex stage + the custom-VJP kernel pair.
    ``y0``/``stride``/``rows`` select the dp-sharded output-row window.
    """
    from ptre_tpu.ops import vecmat as vm

    ss = config.supersample
    if rows is None:
        rows = config.height
    h_ss = rows * ss
    w_ss = config.width * ss
    lanes = _lanes_for_width(w_ss)
    assert lanes and h_ss % _SUB == 0, (h_ss, w_ss)

    cols, cbox = _soft_cols(packet, cam, config)
    # dilate chunk bboxes: beyond 14 sigma the sigmoid coverage is < 1e-6
    # and the reference's own threshold zeroes the pair exactly
    dil = _DILATE_SIGMA * float(sigma)
    cbox = cbox.at[:, 0].add(-dil).at[:, 1].add(dil)
    cbox = cbox.at[:, 2].add(-dil).at[:, 3].add(dil)

    light = vm.normalize(jnp.asarray(config.light_dir, jnp.float32))
    ambient = config.ambient_strength * jnp.asarray(config.clear_color,
                                                    jnp.float32)
    scalars = jnp.concatenate([
        ambient,
        jnp.asarray(config.albedo, jnp.float32),
        light,
        jnp.asarray(config.clear_color, jnp.float32),
        jnp.stack([jnp.float32(1.0 / sigma),
                   jnp.asarray(y0, jnp.float32),
                   jnp.asarray(stride, jnp.float32),
                   jnp.float32(0.0)]),
    ])
    core = _make_core(h_ss, w_ss, lanes, ss, bool(interpret))
    img_p = core(cols, cbox, scalars)
    img = jnp.transpose(img_p, (1, 2, 0))
    return img.reshape(rows, ss, config.width, ss, 3).mean(axis=(1, 3))
