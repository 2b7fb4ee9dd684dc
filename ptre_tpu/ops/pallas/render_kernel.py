"""Whole-sample fused render kernel: ray gen + bounce loop + accumulation.

The reference's hot loop is one CUDA launch per progressive sample: per
pixel, generate a jittered camera ray (`camera.cu:20-43`), trace the bounce
loop (`path_tracer.cu:231-328`), then clamp/scrub and fold into the running
average (`path_tracer.cu:345-365`). The staged TPU pipeline splits that into
an XLA ray-gen pass (writing 2 x (R, 3) rays to HBM), the megakernel, and an
XLA accumulate pass — at 1080p that's ~150 MB of HBM traffic and ~5 ms of
XLA passes around a ~7 ms kernel. This kernel is the whole sample in ONE
dispatch:

  * pixel coordinates come from the grid (2D tiles of 8 rows x `lanes`
    cols), so blocks are spatially coherent — sky tiles terminate after one
    bounce and skip the rest via the `pl.when` early-out in `_trace_block`;
  * ray generation runs in-kernel from six precomputed 3-vector rows
    (`camera_rows`): origin = x·A + y·B + C, direction ∝ x·DA + y·DB + DC
    over NDC — the closed form of the reference's near/far unproject
    (`camera.cu:20-43`), chosen over the combined-inverse-matrix form whose
    far-point w cancels catastrophically under TPU matmul precision;
  * the bounce loop is `megakernel._trace_block` (shared code);
  * the per-sample clamp + NaN scrub (`path_tracer.cu:345-353`) and the
    running average ``lin = c/n + lin*(n-1)/n`` (`path_tracer.cu:356-358`)
    run on the VMEM-resident tile, with the accumulation buffer aliased
    in-place (donated) — the only HBM traffic for a whole sample is one
    read + one write of the (3, H, W) accumulator.

The accumulator is PLANAR (3, H, W): (H, W, 3) would put the 3-channel axis
on the 128-lane dimension. `pathtracer.render_step` transposes at the step
boundary so the public AccumState stays (H, W, 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptre_tpu.ops import vecmat as vm
from ptre_tpu.ops.camera import PERSPECTIVE
from ptre_tpu.ops.pallas.megakernel import (
    _DENSE_MAX_SPH,
    _DENSE_MAX_TRI,
    _DENSE_SUB,
    _trace_block,
    _u01,
    pack_mats,
    pack_sph16,
    pack_tri32,
)

_MAX_LANES = 512


def _lanes_for_width(width: int) -> int:
    """Largest multiple of 128 that divides width, capped at _MAX_LANES."""
    for lanes in (512, 384, 256, 128):
        if lanes <= _MAX_LANES and width % lanes == 0:
            return lanes
    return 0


def supports(cam, packet, config) -> bool:
    """Whether the fused sample kernel applies: 2D-tileable image and a
    small (serial-sweep) scene."""
    from ptre_tpu.ops.pallas import megakernel

    return (
        cam.height % _DENSE_SUB == 0
        and _lanes_for_width(cam.width) > 0
        and max(int(packet.num_triangles), 1) <= _DENSE_MAX_TRI
        and max(int(packet.num_spheres), 1) <= _DENSE_MAX_SPH
        and packet.num_materials <= megakernel._MAX_MATS
    )


def _render_kernel(
    scal_ref,  # SMEM f32 (16,): t_min t_max det_eps shadow_eps pdf_eps n W H
    sky_ref,  # SMEM f32 (8,)
    seed_ref,  # SMEM i32 (1,)
    cam_ref,  # SMEM f32 (24,): analytic ray rows A B C DA DB DC (x3 each)
    accum_ref,  # VMEM (3, 8, lanes) block of the (3, H, W) accumulator (aliased out)
    urand_ref,  # VMEM (2 + 2*max_depth, 8, lanes) block (or dummy)
    tri_ref,  # SMEM (T, 32)
    sph_ref,  # SMEM (S, 16)
    mat_ref,  # SMEM (8, 8)
    out_ref,  # VMEM (3, 8, lanes) block: updated accumulator
    st_ref,  # VMEM (10, 8, lanes) f32 scratch
    *,
    n_tri: int,
    n_sph: int,
    max_depth: int,
    num_mats: int,
    external_rng: bool,
    clamp: bool,
):
    t_min = scal_ref[0]
    t_max = scal_ref[1]
    det_eps = scal_ref[2]
    shadow_eps = scal_ref[3]
    pdf_eps = scal_ref[4]
    n = scal_ref[5]  # running-average sample index (frame+1), as float
    inv_w = scal_ref[6]
    inv_h = scal_ref[7]

    i = pl.program_id(0)
    j = pl.program_id(1)
    if not external_rng:
        pltpu.prng_seed(seed_ref[0] + i * pl.num_programs(1) + j)

    shape = st_ref.shape[1:]  # (8, lanes)
    lanes = shape[1]

    # ---- pixel coords for this tile (x right, y down) ---------------------
    py = (i * _DENSE_SUB + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
          ).astype(jnp.float32)
    px = (j * lanes + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
          ).astype(jnp.float32)

    # ---- jitter +-0.5 (`camera.cu:24-25`) ---------------------------------
    if external_rng:
        jx = urand_ref[0] - 0.5
        jy = urand_ref[1] - 0.5
    else:
        jx = _u01(pltpu.prng_random_bits(shape)) - 0.5
        jy = _u01(pltpu.prng_random_bits(shape)) - 0.5

    # ---- in-kernel analytic ray gen (`camera.cu:20-43`, reformulated) -----
    # origin = x*A + y*B + C (the near-plane point), dir ∝ x*DA + y*DB + DC;
    # mathematically identical to the reference's near/far unproject but
    # with no w-divide cancellation (`camera_rows` docstring).
    x_ndc = (px + jx) * (2.0 * inv_w) - 1.0
    y_ndc = 1.0 - (py + jy) * (2.0 * inv_h)
    ox = x_ndc * cam_ref[0] + y_ndc * cam_ref[3] + cam_ref[6]
    oy = x_ndc * cam_ref[1] + y_ndc * cam_ref[4] + cam_ref[7]
    oz = x_ndc * cam_ref[2] + y_ndc * cam_ref[5] + cam_ref[8]
    dx = x_ndc * cam_ref[9] + y_ndc * cam_ref[12] + cam_ref[15]
    dy = x_ndc * cam_ref[10] + y_ndc * cam_ref[13] + cam_ref[16]
    dz = x_ndc * cam_ref[11] + y_ndc * cam_ref[14] + cam_ref[17]
    dlen = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    dinv = jnp.where(dlen > 0.0, 1.0 / jnp.where(dlen > 0.0, dlen, 1.0), 0.0)
    dx, dy, dz = dx * dinv, dy * dinv, dz * dinv

    # ---- trace ------------------------------------------------------------
    st_ref[0] = ox
    st_ref[1] = oy
    st_ref[2] = oz
    st_ref[3] = dx
    st_ref[4] = dy
    st_ref[5] = dz
    st_ref[6] = jnp.ones(shape, jnp.float32)
    st_ref[7] = jnp.ones(shape, jnp.float32)
    st_ref[8] = jnp.ones(shape, jnp.float32)
    st_ref[9] = jnp.ones(shape, jnp.float32)

    if external_rng:
        def get_uniforms(bounce):
            return urand_ref[2 + 2 * bounce], urand_ref[3 + 2 * bounce]
    else:
        def get_uniforms(bounce):
            return (_u01(pltpu.prng_random_bits(shape)),
                    _u01(pltpu.prng_random_bits(shape)))

    _trace_block(st_ref, tri_ref, sph_ref, mat_ref, sky_ref, t_min, t_max,
                 det_eps, shadow_eps, pdf_eps, get_uniforms,
                 n_tri=n_tri, n_sph=n_sph, max_depth=max_depth,
                 num_mats=num_mats)

    # ---- per-sample clamp + NaN scrub + running average -------------------
    inv_n = 1.0 / n
    w_old = (n - 1.0) * inv_n
    for c in range(3):
        col = st_ref[6 + c]
        if clamp:
            col = jnp.clip(col, 0.0, 1.0)
        col = jnp.where(col != col, 0.0, col)  # NaN scrub (cu:351-353)
        out_ref[c] = col * inv_n + accum_ref[c] * w_old


@functools.partial(
    jax.jit,
    static_argnames=("n_tri", "n_sph", "lanes", "max_depth", "num_mats",
                     "external_rng", "clamp", "interpret"),
)
def _render_call(scalars, sky, seed, camv, accum, urand, tris, sphs, mats,
                 n_tri, n_sph, lanes, max_depth, num_mats, external_rng,
                 clamp, interpret=False):
    _, H, W = accum.shape
    urand_shape = urand.shape
    out = pl.pallas_call(
        functools.partial(
            _render_kernel, n_tri=n_tri, n_sph=n_sph, max_depth=max_depth,
            num_mats=num_mats, external_rng=external_rng, clamp=clamp,
        ),
        grid=(H // _DENSE_SUB, W // lanes),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, _DENSE_SUB, lanes), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((urand_shape[0], _DENSE_SUB, lanes),
                         lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
            if external_rng
            else pl.BlockSpec(urand_shape, lambda i, j: (0, 0, 0),
                              memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((3, _DENSE_SUB, lanes), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((10, _DENSE_SUB, lanes), jnp.float32)],
        input_output_aliases={4: 0},
        interpret=interpret,
    )(scalars, sky, seed, camv, accum, urand, tris, sphs, mats)
    return out


def camera_rows(cam):
    """Analytic ray-gen rows, (24,) for SMEM: origin = x·A + y·B + C,
    dir ∝ x·DA + y·DB + DC over NDC (x, y).

    Equivalent to the reference's near/far inverse-projection
    (`camera.cu:20-43`) but solved in closed form: the perspective matrix
    maps view (x, y, z) to NDC (x·m00/z, y·m11/z, ·), so the near-plane
    point is view (x_ndc·n/m00, y_ndc·n/m11, n) and far−near ∝
    (x_ndc/m00, y_ndc/m11, 1), pushed through the affine inv(view). The
    combined-inverse-matrix formulation is numerically fatal here: its
    far-point w is n/(f−n) ≈ 1e-4 obtained by cancelling ~100-magnitude
    terms, which TPU default-precision matmuls round to exactly 0.
    """
    inv_view = vm.inverse(cam.view_matrix())
    rot = inv_view[:3, :3]  # row-vector: world = v @ rot + t
    t = inv_view[3, :3]
    proj = cam.projection_matrix()
    m00 = proj[0, 0]
    m11 = proj[1, 1]
    n = cam.znear
    if cam.projection == PERSPECTIVE:
        a = (n / m00) * rot[0]
        b = (n / m11) * rot[1]
        c = n * rot[2] + t
        da = rot[0] / m00
        db = rot[1] / m11
        dc = rot[2]
    else:  # orthographic: parallel rays along view z
        a = rot[0] / m00
        b = rot[1] / m11
        c = n * rot[2] + t
        da = jnp.zeros(3, jnp.float32)
        db = jnp.zeros(3, jnp.float32)
        dc = rot[2]
    return jnp.concatenate(
        [a, b, c, da, db, dc, jnp.zeros(6, jnp.float32)]
    ).astype(jnp.float32)


def sample_accum_fused(seed, packet, cam, accum_planar, sample_n, config,
                       urand=None, interpret=False):
    """One progressive sample, fully fused → updated (3, H, W) accumulator.

    Args:
      seed: int32 scalar for the in-kernel hardware PRNG.
      packet: ScenePacket (small scene; see `supports`).
      cam: Camera with height % 8 == 0 and width divisible by a lane count.
      accum_planar: (3, H, W) running-average buffer (donated/aliased).
      sample_n: scalar — this sample's 1-based index n in the running
        average (`path_tracer.cu:356-358`).
      config: RenderConfig.
      urand: optional (2 + 2*max_depth, H, W) uniforms in [0,1) — rows 0-1
        are the pixel jitter (reference jitter minus its -0.5 offset), rows
        2+ the per-bounce scatter draws; CPU/interpret parity mode.
    """
    v0, v1, v2, n0, n1, n2 = packet.world_triangles()
    nt = max(int(packet.num_triangles), 1)
    ns = max(int(packet.num_spheres), 1)
    if v0.shape[0] == 0:
        tris = jnp.zeros((1, 32), jnp.float32)
    else:
        tris = pack_tri32(v0[:nt], v1[:nt], v2[:nt], n0[:nt], n1[:nt],
                          n2[:nt], packet.tri_valid[:nt],
                          packet.tri_mat[:nt], 1)
    if packet.sph_center.shape[0] == 0:
        sphs = jnp.zeros((1, 16), jnp.float32)
    else:
        sphs = pack_sph16(packet.sph_center[:ns], packet.sph_radius[:ns],
                          packet.sph_valid[:ns], packet.sph_mat[:ns], 1)
    mats = pack_mats(packet.mat_kind, packet.mat_albedo, packet.mat_param)

    H, W = cam.height, cam.width
    lanes = _lanes_for_width(W)
    assert lanes and H % _DENSE_SUB == 0, (H, W)

    scalars = jnp.concatenate([
        jnp.array([config.t_min, config.t_max, config.det_eps,
                   config.shadow_eps, config.pdf_eps], jnp.float32),
        jnp.asarray(sample_n, jnp.float32).reshape(1),
        jnp.array([1.0 / W, 1.0 / H], jnp.float32),
        jnp.zeros((8,), jnp.float32),
    ])
    sky = jnp.concatenate(
        [packet.sky_bottom, packet.sky_top, jnp.zeros(2, jnp.float32)]
    ).astype(jnp.float32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    camv = camera_rows(cam)

    if urand is not None:
        external_rng = True
        assert urand.shape == (2 + 2 * config.max_depth, H, W), urand.shape
    else:
        external_rng = False
        urand = jnp.zeros((1, 1, 128), jnp.float32)

    return _render_call(
        scalars, sky, seed, camv, accum_planar, urand, tris, sphs, mats,
        n_tri=nt, n_sph=ns, lanes=lanes, max_depth=config.max_depth,
        num_mats=packet.num_materials, external_rng=external_rng,
        clamp=config.clamp_samples, interpret=interpret,
    )
