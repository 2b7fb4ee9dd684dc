"""Pallas z-buffer tile rasterizer.

TPU-native equivalent of the reference's D3D11 fixed-function pipeline
(`rasterizer.cu`, `vertex_shader.hlsl`, `pixel_shader.hlsl`), replacing the
XLA (samples x triangles) brute-force path of `render.rasterizer` on TPU.
Same image contract as `rasterizer._raster_tile` hard mode: supersampled
z-buffer LESS test (`rasterizer.cu:77-83`), CW-front back-face culling
(`rasterizer.cu:117-124`), perspective-correct normal interpolation, HLSL
ambient+diffuse shading, sky-blue clear (`renderer_base.cu:30`).

Design (round-4 shortlist rewrite): the supersampled image is cut into
square-ish (32, 128) pixel tiles (grid = tiles); the whole Z-curve-sorted
triangle table is VMEM-resident. Tile binning happens OUTSIDE the kernel:
XLA evaluates the full (tiles x chunk-bboxes) overlap matrix and compacts
each tile's overlapping 64-triangle chunk ids into a per-tile SHORTLIST
(`_tile_shortlists`), so the kernel's `fori_loop` visits only chunks that
really overlap its tile — no per-chunk scalar gates in the hot path at
all. Per visited chunk the sweep does one lexicographic (z, index)
closest-hit pass per pixel row (triangles on sublanes, pixels on lanes),
recording (z, winner index); winner attributes are gathered AFTER the
loop with one one-hot MXU matmul per chunk in the [min, max] winner-index
range, then re-interpolated exactly and shaded (HLSL ambient+diffuse).

The differentiable SoftRas path and the CPU path stay in
`render.rasterizer`; this kernel is forward-only, like the megakernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptre_tpu.ops import vecmat as vm
from ptre_tpu.render.rasterizer import transform_vertices

_SUB = 8
_TRI_CHUNK = 64
_FAR = 1.0e9


def _lanes_for_width(width: int) -> int:
    for lanes in (512, 384, 256, 128):
        if width % lanes == 0:
            return lanes
    return 0


#: VMEM-residency cap for the (T_pad, 32) f32 triangle table (3 MB of the
#: ~16 MB VMEM; bigger scenes fall back to the XLA row-chunked path)
_MAX_RESIDENT_TRIS = 24576


def supports(config) -> bool:
    ss = config.supersample
    th, tw = _tile_shape(config.height * ss, config.width * ss)
    return th > 0 and tw > 0


def fits(packet) -> bool:
    """Whether the packet's triangle table fits the resident-VMEM budget."""
    return packet.tri_v0.shape[0] + _TRI_CHUNK <= _MAX_RESIDENT_TRIS


def _morton2_order(cx, cy, keep):
    """Screen-space Z-curve ordering of triangles by bbox center.

    Mesh index order groups triangles into RINGS (uv-sphere bands wrap all
    the way around in x), so a `_TRI_CHUNK`-sized chunk's union bbox is a
    wide slab that overlaps most tiles in its rows — the chunk/tri bbox gates
    barely cull. Sorting by 2D screen Morton code makes chunks spatially
    compact squares, so the existing scalar gates reject nearly everything
    (measured 36.9 -> ~8 ms/frame at 720p ss=2, no kernel change).
    Dead (keep=0) rows sort last.
    """
    lo_x = jnp.min(jnp.where(keep, cx, jnp.inf))
    hi_x = jnp.max(jnp.where(keep, cx, -jnp.inf))
    lo_y = jnp.min(jnp.where(keep, cy, jnp.inf))
    hi_y = jnp.max(jnp.where(keep, cy, -jnp.inf))
    sx_ = jnp.clip((cx - lo_x) / jnp.maximum(hi_x - lo_x, 1e-6) * 65535.0,
                   0.0, 65535.0).astype(jnp.uint32)
    sy_ = jnp.clip((cy - lo_y) / jnp.maximum(hi_y - lo_y, 1e-6) * 65535.0,
                   0.0, 65535.0).astype(jnp.uint32)

    def spread(x):  # interleave 16 bits with 1-bit gaps
        x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)
        x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
        x = (x | (x << 2)) & jnp.uint32(0x33333333)
        x = (x | (x << 1)) & jnp.uint32(0x55555555)
        return x

    code = spread(sx_) | (spread(sy_) << 1)
    key = jnp.where(keep, code, jnp.uint32(0xFFFFFFFF))
    return jnp.argsort(key).astype(jnp.int32)


def pack_raster_tris(packet, cam, config):
    """Vertex stage + viewport transform → (T_pad, 32) SoA triangle table.

    Cols: 0-5 screen xy per corner; 6-8 ndc z; 9-11 1/w; 12 keep flag;
    13-21 world normal * (1/w) per corner (perspective-correct numerators);
    22 1/area; 23-26 screen bbox (minx, maxx, miny, maxy); pad to 32.

    Rows are sorted along a screen-space Z-curve (`_morton2_order`) so the
    per-chunk union bboxes are compact — the raster analogue of the path
    tracer's Morton tile culling. The z-buffer resolve is order-independent
    up to z-ties, which break toward the lower sorted index (same
    first-wins rule as the reference's sequential draw order,
    `rasterizer.cu:157-169`; ties across DIFFERENT triangles at equal
    depth are coplanar-edge cases where either normal is equally valid).
    """
    ss = config.supersample
    Ws, Hs = config.width * ss, config.height * ss

    view = cam.view_matrix()
    proj = cam.projection_matrix()
    tri_v = jnp.stack([packet.tri_v0, packet.tri_v1, packet.tri_v2], axis=1)
    tri_n = jnp.stack([packet.tri_n0, packet.tri_n1, packet.tri_n2], axis=1)
    ndc, w, n_world = transform_vertices(
        tri_v, tri_n, packet.tri_dc, packet.transforms, view, proj
    )
    sx = (ndc[..., 0] + 1.0) * 0.5 * Ws  # (T, 3)
    sy = (1.0 - ndc[..., 1]) * 0.5 * Hs
    z = ndc[..., 2]
    iw = 1.0 / w

    # signed area (positive = CW front in y-down screen space)
    area = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
        sx[:, 2] - sx[:, 0]
    ) * (sy[:, 1] - sy[:, 0])
    keep = packet.tri_valid & (jnp.min(w, axis=1) > 0.0)
    if config.cull_backfaces:
        keep = keep & (area > 0.0)
    else:
        keep = keep & (jnp.abs(area) > 0.0)
    inv_area = 1.0 / jnp.where(area == 0.0, 1.0, area)

    n_iw = n_world * iw[..., None]  # (T, 3, 3)
    cols = jnp.concatenate(
        [
            sx[:, 0:1], sy[:, 0:1], sx[:, 1:2], sy[:, 1:2], sx[:, 2:3],
            sy[:, 2:3],
            z, iw,
            keep[:, None].astype(jnp.float32),
            n_iw.reshape(-1, 9),
            inv_area[:, None],
            jnp.min(sx, axis=1, keepdims=True),
            jnp.max(sx, axis=1, keepdims=True),
            jnp.min(sy, axis=1, keepdims=True),
            jnp.max(sy, axis=1, keepdims=True),
            jnp.zeros((sx.shape[0], 5), jnp.float32),
        ],
        axis=1,
    )
    # sanitize DROPPED rows (valid=0, behind-camera w<=0, zero-area): their
    # screen coords/depths/normals can be NaN/inf from the w-divide, and
    # NaN poisons even masked arithmetic (0 * NaN = NaN) in both the z-test
    # and the SoftRas coverage/softmax paths. Zero the payload and give
    # them a never-hit bbox.
    keep_rows = cols[:, 12] > 0.5
    big = jnp.float32(3e38)
    safe = jnp.zeros((1, 32), jnp.float32)
    safe = safe.at[0, 23].set(big).at[0, 24].set(-big)
    safe = safe.at[0, 25].set(big).at[0, 26].set(-big)
    cols = jnp.where(keep_rows[:, None], cols, safe)

    # screen-space Z-curve sort → spatially compact chunks (see
    # `_morton2_order`); dead rows go last so trailing chunks are all-pad
    perm = _morton2_order((cols[:, 23] + cols[:, 24]) * 0.5,
                          (cols[:, 25] + cols[:, 26]) * 0.5, keep_rows)
    cols = cols[perm]

    T = cols.shape[0]
    pad = (-T) % _TRI_CHUNK
    if pad:
        cols = jnp.pad(cols, ((0, pad), (0, 0)))

    # per-chunk union bbox + any-keep flag: one scalar test rejects a whole
    # chunk per tile (mesh index order is spatially coherent, so chunk
    # bboxes are tight — cube faces, uv-sphere bands)
    n_chunks = cols.shape[0] // _TRI_CHUNK
    ck = cols.reshape(n_chunks, _TRI_CHUNK, 32)
    keep_c = ck[:, :, 12] > 0.5
    big = jnp.float32(3e38)
    minx = jnp.min(jnp.where(keep_c, ck[:, :, 23], big), axis=1)
    maxx = jnp.max(jnp.where(keep_c, ck[:, :, 24], -big), axis=1)
    miny = jnp.min(jnp.where(keep_c, ck[:, :, 25], big), axis=1)
    maxy = jnp.max(jnp.where(keep_c, ck[:, :, 26], -big), axis=1)
    any_keep = jnp.any(keep_c, axis=1).astype(jnp.float32)
    cbox = jnp.stack(
        [minx, maxx, miny, maxy, any_keep,
         jnp.zeros_like(minx), jnp.zeros_like(minx), jnp.zeros_like(minx)],
        axis=1,
    )
    return cols, cbox


_BIG_IDX = 1.0e9


def _tile_shape(height_ss: int, width_ss: int):
    """Pick the (tile_h, tile_w) pixel-tile shape for the sweep kernel.

    Square-ish tiles minimize (chunk, tile) overlap pairs: chunk union
    bboxes are Morton-compact ~square patches, so a (32, 128) tile
    overlaps ~2x fewer chunks than the old (8, 512) row slab at the same
    4096-pixel area / per-pair sweep cost (measured 1420 -> ~650 hit
    pairs on the 720p ss=2 demo scene). Shorter tiles are the fallback for
    heights 32 doesn't divide; the width must be lane-aligned (any width a
    wider multiple of 128 divides is already divisible by 128, so 128 is
    the only reachable lane count).
    """
    for th in (32, 16, 8):
        if height_ss % th == 0:
            break
    else:
        return 0, 0
    if width_ss % 128 == 0:
        return th, 128
    return 0, 0


def _tile_shortlists(cbox, n_ti, n_tj, th, tw):
    """Per-tile compact chunk shortlists, built in XLA (not in-kernel).

    The r4 single-pass kernel still gated every (tile, chunk) pair with a
    scalar `pl.when` inside a `fori_loop` — ~28k gate iterations at 720p
    ss=2, each costing a measured few-hundred ns even when the chunk is
    rejected (PERF.md round-4 constants). Same cure as the wavefront path
    tracer's mask/shortlist split: evaluate the whole (tiles x chunks)
    bbox-overlap matrix vectorized in XLA, sort each tile's hit chunk ids
    to the front (ascending, preserving the lower-Morton-chunk-first
    z-tie rule), and hand the kernel a per-tile (count, ids) shortlist so
    its loop body runs ONLY over chunks that really overlap the tile.
    """
    ty0 = jnp.arange(n_ti, dtype=jnp.float32)[:, None, None] * th
    tx0 = jnp.arange(n_tj, dtype=jnp.float32)[None, :, None] * tw
    hit = (
        (cbox[None, None, :, 4] > 0.5)
        & (cbox[None, None, :, 0] < tx0 + tw)
        & (cbox[None, None, :, 1] >= tx0)
        & (cbox[None, None, :, 2] < ty0 + th)
        & (cbox[None, None, :, 3] >= ty0)
    )  # (n_ti, n_tj, C)
    n_chunks = cbox.shape[0]
    ids = jnp.where(hit, jnp.arange(n_chunks, dtype=jnp.int32), n_chunks)
    ids = jnp.sort(ids, axis=-1)
    count = jnp.sum(hit, axis=-1, dtype=jnp.int32)
    return ids, count


def _raster_kernel(
    scal_ref,  # SMEM f32 (16,): ambient rgb, albedo rgb, light xyz, clear rgb
    sl_ref,  # SMEM (1, 1, n_chunks) i32: THIS tile's hit-chunk shortlist
    cnt_ref,  # SMEM (1, 1, 1) i32: valid shortlist entries for this tile
    tri_ref,  # VMEM (T_pad, 32): the WHOLE triangle table, resident
    out_ref,  # VMEM (3, th, tw) shaded tile
    zb_ref,  # scratch (th, tw): z-buffer
    wi_ref,  # scratch (th, tw): winner GLOBAL triangle index (f32)
    oh_ref,  # scratch (TRI_CHUNK, th*tw): winner one-hots for all rows
    at_ref,  # scratch (32, th*tw): gathered winner attributes
    *,
    th: int,
    lanes: int,
):
    """Vectorized tile rasterizer: triangles on SUBLANES, pixels on lanes.

    The r3 kernel ran three passes per (chunk, row) — candidate z, tie
    index, one-hot stash — plus a gather matmul per visited chunk. This
    version keeps ONE pass per (chunk, row): a lexicographic (z, index)
    closest-hit merge (identical winners: strict-< across chunks keeps the
    earlier = lower Morton index, lowest index among in-chunk z-ties — the
    reference's first-drawn-wins z-test, `rasterizer.cu:80`), recording
    only (z, winner index) per pixel. Attribute gather is DEFERRED to one
    post-loop pass over the [min, max] winner-index chunk range (a handful
    of Morton-compact chunks per tile), with one one-hot MXU matmul per
    range chunk for all 8 rows, then exact re-interpolation. 21.9 ->
    ~2x less per-chunk work at 720p ss=2.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    shape = zb_ref.shape
    n_groups = _TRI_CHUNK // _SUB

    zb_ref[...] = jnp.full(shape, _FAR, jnp.float32)
    wi_ref[...] = jnp.full(shape, _BIG_IDX, jnp.float32)

    # tile origin in supersampled pixel space
    tx0 = (j * lanes).astype(jnp.float32)
    ty0 = (i * th).astype(jnp.float32)

    px = tx0 + jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1).astype(
        jnp.float32) + 0.5  # (1, L)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (_SUB, lanes), 0).astype(
        jnp.float32)  # triangle sublane id within a group

    def chunk_body(t, carry):
        # shortlists hold only overlapping chunks (built in XLA,
        # `_tile_shortlists`), so the sweep runs unconditionally — no
        # per-chunk scalar gate. (r3/r4 history: a per-row bbox `pl.when`
        # gate was tried and measured SLOWER; the r4 per-chunk gate loop
        # itself cost ~0.3 µs per REJECTED chunk, which this removes.)
        k = sl_ref[0, 0, t]
        base = k * _TRI_CHUNK
        blk_all = tri_ref[pl.dslice(base, _TRI_CHUNK), :]  # (_TRI_CHUNK, 32)

        def row_pass(r, py_r):
            best_z = jnp.full((1, lanes), _FAR, jnp.float32)
            best_i = jnp.full((1, lanes), _BIG_IDX, jnp.float32)
            for g in range(n_groups):
                blk = blk_all[g * _SUB:(g + 1) * _SUB, :]  # (8, 32)
                c = lambda col: blk[:, col:col + 1]  # (8, 1)
                w0 = ((c(2) - px) * (c(5) - py_r)
                      - (c(4) - px) * (c(3) - py_r)) * c(22)
                w1 = ((c(4) - px) * (c(1) - py_r)
                      - (c(0) - px) * (c(5) - py_r)) * c(22)
                w2 = 1.0 - w0 - w1
                z = w0 * c(6) + w1 * c(7) + w2 * c(8)
                covered = (
                    (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
                    & (z >= 0.0) & (z <= 1.0) & (c(12) > 0.5)
                )
                zc = jnp.where(covered, z, _FAR)
                gmin = jnp.min(zc, axis=0, keepdims=True)
                # lowest sublane among in-group z-ties
                cand = jnp.where(zc == gmin, sub8, _BIG_IDX)
                gidx = (jnp.min(cand, axis=0, keepdims=True)
                        + (base + g * _SUB).astype(jnp.float32))
                upd = (gmin < best_z) | ((gmin == best_z)
                                         & (gidx < best_i))
                best_i = jnp.where(upd, gidx, best_i)
                best_z = jnp.where(upd, gmin, best_z)

            # z-buffer LESS merge vs earlier chunks (strict < keeps the
            # earlier = lower-sorted-index chunk on ties; shortlists are
            # ascending so sweep order == chunk order)
            zb = zb_ref[r:r + 1, :]
            upd = best_z < zb
            zb_ref[r:r + 1, :] = jnp.where(upd, best_z, zb)
            wi_ref[r:r + 1, :] = jnp.where(upd, best_i,
                                           wi_ref[r:r + 1, :])

        for r in range(th):
            row_pass(r, ty0 + float(r) + 0.5)
        return carry

    jax.lax.fori_loop(0, cnt_ref[0, 0, 0], chunk_body, 0)

    # ---- deferred winner gather: one one-hot matmul per chunk in the ----
    # [min, max] winner-index range (Morton-compact winners span only a
    # few chunks per tile), then exact re-interpolation + HLSL shade
    hit = zb_ref[...] < _FAR
    hit_f = hit.astype(jnp.float32)

    # clear / sky first; shaded pixels overwritten below
    for c in range(3):
        out_ref[c] = jnp.full(shape, scal_ref[9 + c], jnp.float32)

    @pl.when(jnp.max(hit_f) > 0.5)
    def _gather_and_shade():
        wlo = jnp.where(hit, wi_ref[...], _BIG_IDX)
        whi = jnp.where(hit, wi_ref[...], -1.0)
        lo_c = jnp.min(wlo).astype(jnp.int32) // _TRI_CHUNK
        hi_c = jnp.max(whi).astype(jnp.int32) // _TRI_CHUNK

        at_ref[...] = jnp.zeros_like(at_ref)

        def gather_chunk(k, carry):
            base = k * _TRI_CHUNK
            blk_all = tri_ref[pl.dslice(base, _TRI_CHUNK), :]
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (_TRI_CHUNK, lanes), 0).astype(jnp.float32)
            for r in range(th):
                oh_ref[:, r * lanes:(r + 1) * lanes] = (
                    ((rows + base.astype(jnp.float32)) == wi_ref[r:r + 1, :])
                    .astype(jnp.float32) * hit_f[r:r + 1, :])
            at_ref[...] = at_ref[...] + jax.lax.dot_general(
                blk_all, oh_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (32, 8*L)
            return carry

        jax.lax.fori_loop(lo_c, hi_c + 1, gather_chunk, 0)

        for r in range(th):
            py_r = ty0 + float(r) + 0.5
            attrs = at_ref[:, r * lanes:(r + 1) * lanes]
            # re-interpolate the winner exactly (same algebra as the sweep)
            a = lambda col: attrs[col:col + 1, :]
            w0 = ((a(2) - px) * (a(5) - py_r)
                  - (a(4) - px) * (a(3) - py_r)) * a(22)
            w1 = ((a(4) - px) * (a(1) - py_r)
                  - (a(0) - px) * (a(5) - py_r)) * a(22)
            w2 = 1.0 - w0 - w1
            den = w0 * a(9) + w1 * a(10) + w2 * a(11)
            nnx = w0 * a(13) + w1 * a(16) + w2 * a(19)
            nny = w0 * a(14) + w1 * a(17) + w2 * a(20)
            nnz = w0 * a(15) + w1 * a(18) + w2 * a(21)
            inv_den = 1.0 / jnp.where(den == 0.0, 1.0, den)
            nx = nnx * inv_den
            ny = nny * inv_den
            nz = nnz * inv_den
            nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
            ninv = jnp.where(
                nlen > 0.0, 1.0 / jnp.where(nlen > 0.0, nlen, 1.0), 0.0)
            nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
            diffuse = jnp.maximum(
                -(nx * scal_ref[6] + ny * scal_ref[7] + nz * scal_ref[8]),
                0.0)
            hr = hit[r:r + 1, :]
            for c in range(3):
                shaded = (scal_ref[c] + diffuse) * scal_ref[3 + c]
                out_ref[c, r:r + 1, :] = jnp.where(
                    hr, shaded, scal_ref[9 + c])


@functools.partial(
    jax.jit,
    static_argnames=("height_ss", "width_ss", "th", "lanes", "interpret"),
)
def _raster_call(scalars, cbox, tris, height_ss, width_ss, th, lanes,
                 interpret=False):
    n_ti, n_tj = height_ss // th, width_ss // lanes
    sl, cnt = _tile_shortlists(cbox, n_ti, n_tj, th, lanes)
    n_chunks = sl.shape[-1]
    # 3D (n_tiles, 1, n_chunks): leading dims carry the per-tile block
    # index (no tiling constraint), and the BLOCKED trailing two dims equal
    # the array dims exactly — Mosaic requires last-two block dims to be
    # (8, 128)-divisible or array-equal, which a 2D (1, n_chunks) block of
    # a (n_tiles, n_chunks) array violates
    sl = sl.reshape(n_ti * n_tj, 1, -1)
    cnt = cnt.reshape(n_ti * n_tj, 1, 1)
    out = pl.pallas_call(
        functools.partial(_raster_kernel, th=th, lanes=lanes),
        grid=(n_ti, n_tj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # per-tile shortlist blocks: per-program SMEM stays O(n_chunks)
            # (the whole (n_tiles, n_chunks) table is ~6 MB at 1080p ss=2 —
            # far past the SMEM budget if passed unblocked)
            pl.BlockSpec((1, 1, n_chunks), lambda i, j: (i * n_tj + j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i, j: (i * n_tj + j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # resident table
        ],
        out_specs=pl.BlockSpec((3, th, lanes), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, height_ss, width_ss), jnp.float32),
        scratch_shapes=[pltpu.VMEM((th, lanes), jnp.float32)] * 2
        + [pltpu.VMEM((_TRI_CHUNK, th * lanes), jnp.float32),
           pltpu.VMEM((32, th * lanes), jnp.float32)],
        interpret=interpret,
    )(scalars, sl, cnt, tris)
    return out


def rasterize_fused(packet, cam, config, interpret=False):
    """Rasterize via the Pallas tile kernel → (H, W, 3), resolved.

    Mirrors `render.rasterizer.rasterize(soft=False)`: supersampled render +
    box resolve (`rasterizer.cu:142` ResolveSubresource analogue).
    """
    ss = config.supersample
    Hs, Ws = config.height * ss, config.width * ss
    th, lanes = _tile_shape(Hs, Ws)
    assert th and lanes, (Hs, Ws)

    tris, cbox = pack_raster_tris(packet, cam, config)
    light = vm.normalize(jnp.asarray(config.light_dir, jnp.float32))
    ambient = config.ambient_strength * jnp.asarray(config.clear_color,
                                                    jnp.float32)
    scalars = jnp.concatenate([
        ambient,
        jnp.asarray(config.albedo, jnp.float32),
        light,
        jnp.asarray(config.clear_color, jnp.float32),
        jnp.zeros(4, jnp.float32),
    ])
    out = _raster_call(scalars, cbox, tris, Hs, Ws, th=th, lanes=lanes,
                       interpret=interpret)
    img = jnp.transpose(out, (1, 2, 0))
    return img.reshape(config.height, ss, config.width, ss, 3).mean(
        axis=(1, 3))
