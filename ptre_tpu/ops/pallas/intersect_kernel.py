"""Pallas TPU kernel: brute-force closest-hit sweep.

The hot loop of the whole framework — the TPU-native re-design of the
reference megakernel's per-thread intersection loop (`path_tracer.cu:252-295`,
`shape.cu:13-46,62-103`).

Design (see /opt/skills/guides/pallas_guide.md):
  * Rays live on LANES (128 per grid step), primitives on SUBLANES: every
    per-(ray, primitive) temporary is a (TILE_P, 128) f32 block that exists
    only in VMEM/vector registers — the XLA fallback materializes O(R*P)
    intermediates in HBM, which made the sweep HBM-bandwidth-bound.
  * Ray SoA is (8, R): component rows broadcast across sublanes for free.
    Primitive SoA is (P, 16): component columns slice to (TILE_P, 1) and
    lane-broadcast.
  * The whole primitive table stays resident in VMEM across the ray grid
    (64 B/triangle → ~1 MB per 16 k triangles); an inner fori_loop walks it
    in TILE_P chunks, keeping a running (best_t, best_idx, hit) per lane.
  * Triangles first, then spheres tested against the triangle-shrunk
    closest-t, preserving the reference's ordering semantics including the
    sphere far-root quirk (`shape.cu:26-36`).
  * Selection outputs only (indices + hit masks): the sweep is DETACHED —
    gradients flow through the O(R) recompute in `ops.intersect.closest_hit`,
    so this kernel needs no VJP and the backward pass never stores the sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # minimum rays per grid step (lane width)
TILE_P = 256  # max primitives per inner-loop chunk
#: per-(ray, primitive) pair-block element budget: bounds VMEM temporaries
#: (~13 live f32 blocks → 13 * 4 B * budget ≈ 1.7 MB at 32768)
PAIR_BUDGET = 32768
_BIG = 3e38


def _tile_for(n: int) -> int:
    """Adaptive primitive tile: small scenes shouldn't pay for 256 padded
    rows (the demo scene has 12 triangles — padding to 256 wastes 95% of the
    VPU work). Round up to the 8-sublane f32 tile, cap at TILE_P."""
    return min(TILE_P, max(8, ((n + 7) // 8) * 8))


def _lanes_for(tile_p: int) -> int:
    """Adaptive ray-lane width: with tiny primitive tiles a 128-ray grid
    step is launch-overhead-bound (a 1080p frame is 16200 steps), so widen
    the step until the pair block hits PAIR_BUDGET."""
    lanes = LANES
    while lanes < 2048 and tile_p * (lanes * 2) <= PAIR_BUDGET:
        lanes *= 2
    return lanes


def _pad_to(x, m, axis=0, fill=0):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def pack_rays(o, d):
    """(R,3)+(R,3) → (8, R_pad) component-row layout."""
    R = o.shape[0]
    rows = jnp.concatenate([o.T, d.T, jnp.zeros((2, R), o.dtype)], axis=0)
    return _pad_to(rows, LANES, axis=1)


def pack_triangles(v0, v1, v2, valid, tile=TILE_P):
    """(T,3)x3 + (T,) → (T_pad, 16) [v0 v1 v2 valid pad...] column layout."""
    cols = jnp.concatenate(
        [v0, v1, v2, valid[:, None].astype(jnp.float32),
         jnp.zeros((v0.shape[0], 6), jnp.float32)], axis=1,
    )
    return _pad_to(cols, tile, axis=0)


def pack_spheres(center, radius, valid, tile=TILE_P):
    """(S,3)+(S,)+(S,) → (S_pad, 16) [c r valid pad...] column layout."""
    cols = jnp.concatenate(
        [center, radius[:, None], valid[:, None].astype(jnp.float32),
         jnp.zeros((center.shape[0], 11), jnp.float32)], axis=1,
    )
    return _pad_to(cols, tile, axis=0)


def _sweep_kernel(
    scalar_ref,  # SMEM (4,): t_min, t_max, det_eps, n_rays (unused: static)
    rays_ref,  # (8, LANES) block
    tris_ref,  # (T_pad, 16) resident
    sphs_ref,  # (S_pad, 16) resident
    i_tri_ref,  # (1, LANES) int32 out
    hit_tri_ref,  # (1, LANES) int32 out
    i_sph_ref,
    hit_sph_ref,
    *,
    tri_tile: int,
    sph_tile: int,
):
    t_min = scalar_ref[0]
    t_max = scalar_ref[1]
    det_eps = scalar_ref[2]

    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]

    n_tri_tiles = tris_ref.shape[0] // tri_tile
    n_sph_tiles = sphs_ref.shape[0] // sph_tile

    # NOTE: both tile loops are PYTHON-unrolled with static slices — Mosaic
    # cannot legalize a dynamic memref slice of the resident table inside an
    # scf.for (fails for any multi-tile scene); static slices also let it
    # schedule each tile's loads ahead of the previous tile's math.
    def tri_body(jt, carry):
        best_t, best_i, any_hit = carry
        blk = tris_ref[jt * tri_tile : (jt + 1) * tri_tile, :]  # (tri_tile, 16)
        v0x, v0y, v0z = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
        v1x, v1y, v1z = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
        v2x, v2y, v2z = blk[:, 6:7], blk[:, 7:8], blk[:, 8:9]
        valid = blk[:, 9:10] > 0.5

        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z

        # pvec = d x e2 → (TILE_P, LANES)
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < det_eps, 1.0, det)

        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

        acc = (
            (jnp.abs(det) >= det_eps)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= t_min) & (t <= t_max)
            & valid
        )
        tm = jnp.where(acc, t, _BIG)
        tile_min = jnp.min(tm, axis=0, keepdims=True)  # (1, LANES)
        tile_arg = jnp.argmin(tm, axis=0).reshape(1, -1).astype(jnp.int32)
        upd = tile_min < best_t
        best_i = jnp.where(upd, jt * tri_tile + tile_arg, best_i)
        best_t = jnp.where(upd, tile_min, best_t)
        any_hit = any_hit | jnp.any(acc, axis=0, keepdims=True)
        return best_t, best_i, any_hit

    lanes = rays_ref.shape[1]
    init = (
        jnp.full((1, lanes), _BIG, jnp.float32),
        jnp.zeros((1, lanes), jnp.int32),
        jnp.zeros((1, lanes), jnp.bool_),
    )
    carry = init
    for jt in range(n_tri_tiles):
        carry = tri_body(jt, carry)
    tri_t, tri_i, tri_hit = carry

    # spheres vs the triangle-shrunk closest (`path_tracer.cu:285-295`)
    tri_best = jnp.where(tri_hit, tri_t, t_max)

    def sph_body(js, carry):
        best_t, best_i, any_hit = carry
        blk = sphs_ref[js * sph_tile : (js + 1) * sph_tile, :]
        cx, cy, cz = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
        r = blk[:, 3:4]
        valid = blk[:, 4:5] > 0.5

        ocx, ocy, ocz = cx - ox, cy - oy, cz - oz
        halfb = dx * ocx + dy * ocy + dz * ocz
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        delta = halfb * halfb - c
        sq = jnp.sqrt(jnp.maximum(delta, 0.0))
        t_near = halfb - sq
        t_far = halfb + sq
        t = jnp.where(t_near >= t_min, t_near, t_far)
        acc = (
            (delta >= 0.0)
            & (t_near <= tri_best)  # near-root-only t_max check (`shape.cu:26-28`)
            & (t >= t_min)
            & valid
        )
        tm = jnp.where(acc, t, _BIG)
        tile_min = jnp.min(tm, axis=0, keepdims=True)
        tile_arg = jnp.argmin(tm, axis=0).reshape(1, -1).astype(jnp.int32)
        upd = tile_min < best_t
        best_i = jnp.where(upd, js * sph_tile + tile_arg, best_i)
        best_t = jnp.where(upd, tile_min, best_t)
        any_hit = any_hit | jnp.any(acc, axis=0, keepdims=True)
        return best_t, best_i, any_hit

    carry = init
    for js in range(n_sph_tiles):
        carry = sph_body(js, carry)
    _, sph_i, sph_hit = carry

    i_tri_ref[:, :] = tri_i
    hit_tri_ref[:, :] = tri_hit.astype(jnp.int32)
    i_sph_ref[:, :] = sph_i
    hit_sph_ref[:, :] = sph_hit.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("tri_tile", "sph_tile", "lanes", "interpret")
)
def sweep_pallas_packed(scalars, rays, tris, sphs, tri_tile=TILE_P,
                        sph_tile=TILE_P, lanes=LANES, interpret=False):
    """Run the sweep kernel on packed arrays → 4 x (R_pad,) int32."""
    r_pad = rays.shape[1]
    grid = (r_pad // lanes,)
    out_shape = [jax.ShapeDtypeStruct((1, r_pad), jnp.int32)] * 4
    outs = pl.pallas_call(
        functools.partial(_sweep_kernel, tri_tile=tri_tile, sph_tile=sph_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)
        ] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(scalars, rays, tris, sphs)
    return outs


def sweep(o, d, packet, world_tris, t_min, t_max, det_eps=1e-6, interpret=False):
    """Drop-in replacement for `ops.intersect.sweep` (same signature/returns)."""
    v0, v1, v2, _, _, _ = world_tris
    R = o.shape[0]
    scalars = jnp.array([t_min, t_max, det_eps, 0.0], jnp.float32)
    tri_tile = _tile_for(v0.shape[0])
    sph_tile = _tile_for(packet.sph_center.shape[0])
    lanes = _lanes_for(max(tri_tile, sph_tile))
    rows = jnp.concatenate([o.T, d.T, jnp.zeros((2, R), o.dtype)], axis=0)
    rays = _pad_to(rows, lanes, axis=1)
    tris = pack_triangles(v0, v1, v2, packet.tri_valid, tri_tile)
    sphs = pack_spheres(packet.sph_center, packet.sph_radius,
                        packet.sph_valid, sph_tile)
    i_tri, hit_tri, i_sph, hit_sph = sweep_pallas_packed(
        scalars, rays, tris, sphs, tri_tile=tri_tile, sph_tile=sph_tile,
        lanes=lanes, interpret=interpret,
    )
    cut = lambda x: x[0, :R]
    return (
        cut(i_tri),
        cut(hit_tri).astype(bool),
        cut(i_sph),
        cut(hit_sph).astype(bool),
    )
