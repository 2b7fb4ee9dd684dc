"""Pallas z-buffer tile rasterizer.

TPU-native equivalent of the reference's D3D11 fixed-function pipeline
(`rasterizer.cu`, `vertex_shader.hlsl`, `pixel_shader.hlsl`), replacing the
XLA (samples x triangles) brute-force path of `render.rasterizer` on TPU.
Same image contract as `rasterizer._raster_tile` hard mode: supersampled
z-buffer LESS test (`rasterizer.cu:77-83`), CW-front back-face culling
(`rasterizer.cu:117-124`), perspective-correct normal interpolation, HLSL
ambient+diffuse shading, sky-blue clear (`renderer_base.cu:30`).

Design: the supersampled image is cut into (8, lanes) pixel tiles; the
z-buffer, perspective-correct normal numerators/denominator and hit flag for
one tile live in VMEM scratch. Triangles stream through SMEM in chunks on
the innermost grid dimension (the TPU grid is sequential, so the tile's
scratch persists across its triangle chunks: init at chunk 0, accumulate,
shade + write at the last chunk). Each triangle is gated by a scalar
screen-bbox vs tile-bbox test (`pl.when`) so off-tile triangles cost ~10
scalar ops and no vector work — the Pallas analogue of hardware tile
binning.

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
_TRI_CHUNK = 128
_FAR = 1.0e9


def _lanes_for_width(width: int) -> int:
    for lanes in (512, 384, 256, 128):
        if width % lanes == 0:
            return lanes
    return 0


def supports(config) -> bool:
    ss = config.supersample
    return (
        (config.height * ss) % _SUB == 0
        and _lanes_for_width(config.width * ss) > 0
    )


def pack_raster_tris(packet, cam, config):
    """Vertex stage + viewport transform → (T_pad, 32) SoA triangle table.

    Cols: 0-5 screen xy per corner; 6-8 ndc z; 9-11 1/w; 12 keep flag;
    13-21 world normal * (1/w) per corner (perspective-correct numerators);
    22 1/area; 23-26 screen bbox (minx, maxx, miny, maxy); pad to 32.
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


def _raster_kernel(
    scal_ref,  # SMEM f32 (16,): ambient rgb, albedo rgb, light xyz, clear rgb
    cbox_ref,  # SMEM (n_chunks, 8): per-chunk union bbox + any-keep
    tri_ref,  # SMEM (TRI_CHUNK, 32) triangle chunk
    out_ref,  # VMEM (3, 8, lanes) shaded tile (revisited across chunks)
    zb_ref,  # scratch (8, lanes): z-buffer
    nx_ref,  # scratch: perspective-correct normal numerators
    ny_ref,
    nz_ref,
    den_ref,  # scratch: 1/w interpolation denominator
    hit_ref,  # scratch: any-coverage flag (1.0/0.0)
    *,
    lanes: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    shape = zb_ref.shape

    @pl.when(k == 0)
    def _():
        zb_ref[...] = jnp.full(shape, _FAR, jnp.float32)
        nx_ref[...] = jnp.zeros(shape, jnp.float32)
        ny_ref[...] = jnp.zeros(shape, jnp.float32)
        nz_ref[...] = jnp.zeros(shape, jnp.float32)
        den_ref[...] = jnp.ones(shape, jnp.float32)
        hit_ref[...] = jnp.zeros(shape, jnp.float32)

    # tile bounds in supersampled pixel space
    tx0 = (j * lanes).astype(jnp.float32)
    ty0 = (i * _SUB).astype(jnp.float32)
    tx1 = tx0 + float(lanes)
    ty1 = ty0 + float(_SUB)

    py = ty0 + jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(
        jnp.float32) + 0.5
    px = tx0 + jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(
        jnp.float32) + 0.5

    chunk_hit = (
        (cbox_ref[k, 4] > 0.5)
        & (cbox_ref[k, 0] < tx1) & (cbox_ref[k, 1] >= tx0)
        & (cbox_ref[k, 2] < ty1) & (cbox_ref[k, 3] >= ty0)
    )

    @pl.when(chunk_hit)
    def _sweep_chunk():
      for t in range(_TRI_CHUNK):
        keep = tri_ref[t, 12] > 0.5
        overlap = (
            (tri_ref[t, 23] < tx1) & (tri_ref[t, 24] >= tx0)
            & (tri_ref[t, 25] < ty1) & (tri_ref[t, 26] >= ty0)
        )

        @pl.when(keep & overlap)
        def _(t=t):
            x0, y0 = tri_ref[t, 0], tri_ref[t, 1]
            x1, y1 = tri_ref[t, 2], tri_ref[t, 3]
            x2, y2 = tri_ref[t, 4], tri_ref[t, 5]
            inv_area = tri_ref[t, 22]
            # edge functions → barycentrics (same algebra as _raster_tile)
            w0 = ((x1 - px) * (y2 - py) - (x2 - px) * (y1 - py)) * inv_area
            w1 = ((x2 - px) * (y0 - py) - (x0 - px) * (y2 - py)) * inv_area
            w2 = 1.0 - w0 - w1
            z = w0 * tri_ref[t, 6] + w1 * tri_ref[t, 7] + w2 * tri_ref[t, 8]
            inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
            covered = inside & (z >= 0.0) & (z <= 1.0)
            upd = covered & (z < zb_ref[...])
            den = (
                w0 * tri_ref[t, 9] + w1 * tri_ref[t, 10] + w2 * tri_ref[t, 11]
            )
            nnx = (
                w0 * tri_ref[t, 13] + w1 * tri_ref[t, 16] + w2 * tri_ref[t, 19]
            )
            nny = (
                w0 * tri_ref[t, 14] + w1 * tri_ref[t, 17] + w2 * tri_ref[t, 20]
            )
            nnz = (
                w0 * tri_ref[t, 15] + w1 * tri_ref[t, 18] + w2 * tri_ref[t, 21]
            )
            zb_ref[...] = jnp.where(upd, z, zb_ref[...])
            nx_ref[...] = jnp.where(upd, nnx, nx_ref[...])
            ny_ref[...] = jnp.where(upd, nny, ny_ref[...])
            nz_ref[...] = jnp.where(upd, nnz, nz_ref[...])
            den_ref[...] = jnp.where(upd, den, den_ref[...])
            hit_ref[...] = jnp.where(upd, 1.0, hit_ref[...])

    @pl.when(k == n_chunks - 1)
    def _():
        # perspective-correct normal + HLSL ambient/diffuse (pixel_shader.hlsl)
        inv_den = 1.0 / jnp.where(den_ref[...] == 0.0, 1.0, den_ref[...])
        nx = nx_ref[...] * inv_den
        ny = ny_ref[...] * inv_den
        nz = nz_ref[...] * inv_den
        nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        ninv = jnp.where(nlen > 0.0, 1.0 / jnp.where(nlen > 0.0, nlen, 1.0),
                         0.0)
        nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
        diffuse = jnp.maximum(
            -(nx * scal_ref[6] + ny * scal_ref[7] + nz * scal_ref[8]), 0.0
        )
        hit = hit_ref[...] > 0.5
        for c in range(3):
            shaded = (scal_ref[c] + diffuse) * scal_ref[3 + c]
            out_ref[c] = jnp.where(hit, shaded, scal_ref[9 + c])


@functools.partial(
    jax.jit, static_argnames=("height_ss", "width_ss", "lanes", "interpret"),
)
def _raster_call(scalars, cbox, tris, height_ss, width_ss, lanes,
                 interpret=False):
    n_chunks = tris.shape[0] // _TRI_CHUNK
    out = pl.pallas_call(
        functools.partial(_raster_kernel, lanes=lanes),
        grid=(height_ss // _SUB, width_ss // lanes, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_TRI_CHUNK, 32), lambda i, j, k: (k, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((3, _SUB, lanes), lambda i, j, k: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, height_ss, width_ss), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_SUB, lanes), jnp.float32)] * 6,
        interpret=interpret,
    )(scalars, cbox, tris)
    return out


def rasterize_fused(packet, cam, config, interpret=False):
    """Rasterize via the Pallas tile kernel → (H, W, 3), resolved.

    Mirrors `render.rasterizer.rasterize(soft=False)`: supersampled render +
    box resolve (`rasterizer.cu:142` ResolveSubresource analogue).
    """
    ss = config.supersample
    Hs, Ws = config.height * ss, config.width * ss
    lanes = _lanes_for_width(Ws)
    assert lanes and Hs % _SUB == 0, (Hs, Ws)

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
    out = _raster_call(scalars, cbox, tris, Hs, Ws, lanes=lanes,
                       interpret=interpret)
    img = jnp.transpose(out, (1, 2, 0))
    return img.reshape(config.height, ss, config.width, ss, 3).mean(
        axis=(1, 3))
