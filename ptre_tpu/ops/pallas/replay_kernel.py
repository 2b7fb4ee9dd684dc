"""Pallas fwd+bwd kernels for the differentiable path replay.

The XLA replay (`ops.path_replay.replay`) is correct but leaves ~10x on the
table fwd+bwd: XLA materializes the bounce chain's intermediates between
partially-fused kernels, and reverse-mode doubles that traffic
(docs/PERF.md "Where backward time goes"). This module fuses the ENTIRE
elementwise chain — triangle/sphere attribute recompute, ONB cosine
scatter, Oren-Nayar/emissive weights, sky, throughput product — into one
Pallas forward kernel and one Pallas backward kernel, keeping rays,
per-bounce gathered primitive rows, and all intermediates in vector
registers/VMEM for the whole path.

Division of labor (TPU-first):
  * XLA: the only O(R) x O(P) coupling — per-bounce winner-row gathers as
    one-hot MXU matmuls (`table.T @ onehot.T`), which also gives the
    table/parameter gradients as the automatic transpose matmul;
  * Pallas: everything elementwise. The backward kernel does not load
    stored residuals: it RECOMPUTES the chain in-registers and applies
    `jax.vjp` *inside the kernel body* (the body is ordinary traced JAX, so
    reverse-mode happens at trace time and Mosaic lowers the resulting
    fused fwd+bwd arithmetic) — in-kernel rematerialization, the cheapest
    possible residual policy.

The chain mirrors `ops.path_replay` formula-for-formula (same guards, same
select order), so kernel gradients match `jax.grad` of the XLA replay to
float tolerance; `tests/test_replay_kernel.py` pins both.

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

from ptre_tpu.ops import gradsafe

_PI = 3.14159265358979
_TAU = 2.0 * _PI

_SUB = 8  # f32 sublane tile
_LANES = 256  # lane width per block (VMEM headroom for the in-kernel vjp)

# g-row layout per bounce (matches ops.path_replay's unified table columns)
G_ROWS = 27  # v0(3) v1(3) v2(3) n0(3) n1(3) n2(3) c(3) r kind albedo(3) param


def _chain_bounce(o, d, c, active, gb, flag_b, ur_b, sky, *, t_min,
                  shadow_eps, pdf_eps):
    """ONE bounce of the replay chain (pure function of its inputs).

    ``active`` is the non-differentiable pre-bounce liveness mask; exposing
    the per-bounce step lets the fused backward kernel checkpoint at bounce
    boundaries (`fused_grad._fused_bwd_kernel`), bounding the in-kernel
    vjp's live values to one bounce's intermediates.

    Returns (o', d', c', next_active).
    """
    ox, oy, oz = o
    dx, dy, dz = d
    cr, cg, cb = c
    sbr, sbg, sbb, str_, stg, stb = sky
    use_sph = flag_b[0] > 0.5
    hit = flag_b[1] > 0.5
    u1, u2 = ur_b
    if True:

        # --- triangle attrs (mirror intersect.triangle_hit_attrs_t) -------
        v0x, v0y, v0z = gb[0], gb[1], gb[2]
        e1x, e1y, e1z = gb[3] - v0x, gb[4] - v0y, gb[5] - v0z
        e2x, e2y, e2z = gb[6] - v0x, gb[7] - v0y, gb[8] - v0z
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        # value-exact, gradient floored near edge-on (ops.gradsafe — keeps
        # the in-kernel vjp's geometry gradients remat-stable and
        # formula-identical to intersect.triangle_hit_attrs_t)
        inv_det = gradsafe.stable_inv_det(
            det, e1x * e1x + e1y * e1y + e1z * e1z,
            e2x * e2x + e2y * e2y + e2z * e2z)
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t_tri = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        w_ = 1.0 - u - v
        inx = w_ * gb[9] + u * gb[12] + v * gb[15]
        iny = w_ * gb[10] + u * gb[13] + v * gb[16]
        inz = w_ * gb[11] + u * gb[14] + v * gb[17]
        # zero-safe normalize (vecmat.normalize)
        nlen_sq = inx * inx + iny * iny + inz * inz
        ninv = jnp.where(
            nlen_sq > 0.0,
            1.0 / jnp.sqrt(jnp.where(nlen_sq > 0.0, nlen_sq, 1.0)), 0.0)
        tnx, tny, tnz = inx * ninv, iny * ninv, inz * ninv
        gnx = e1y * e2z - e1z * e2y
        gny = e1z * e2x - e1x * e2z
        gnz = e1x * e2y - e1y * e2x
        tri_front = dx * gnx + dy * gny + dz * gnz < 0.0
        tsign = jnp.where(tri_front, 1.0, -1.0)
        tnx, tny, tnz = tnx * tsign, tny * tsign, tnz * tsign
        p_tx = ox + t_tri * dx
        p_ty = oy + t_tri * dy
        p_tz = oz + t_tri * dz

        # --- sphere attrs (mirror intersect.sphere_hit_attrs_t) -----------
        scx, scy, scz, sr = gb[18], gb[19], gb[20], gb[21]
        ocx, ocy, ocz = scx - ox, scy - oy, scz - oz
        halfb = dx * ocx + dy * ocy + dz * ocz
        c_ = ocx * ocx + ocy * ocy + ocz * ocz - sr * sr
        delta = halfb * halfb - c_
        # value-exact, gradient floored near the silhouette (ops.gradsafe)
        sq = gradsafe.stable_sqrt_delta(delta, sr)
        t_near = halfb - sq
        t_sph = jnp.where(t_near >= t_min, t_near, halfb + sq)
        p_sx = ox + t_sph * dx
        p_sy = oy + t_sph * dy
        p_sz = oz + t_sph * dz
        r_safe = jnp.where(sr > 0.0, sr, 1.0)
        snx = (p_sx - scx) / r_safe
        sny = (p_sy - scy) / r_safe
        snz = (p_sz - scz) / r_safe
        sph_front = dx * snx + dy * sny + dz * snz < 0.0
        ssign = jnp.where(sph_front, 1.0, -1.0)
        snx, sny, snz = snx * ssign, sny * ssign, snz * ssign

        px = jnp.where(use_sph, p_sx, p_tx)
        py = jnp.where(use_sph, p_sy, p_ty)
        pz = jnp.where(use_sph, p_sz, p_tz)
        nx = jnp.where(use_sph, snx, tnx)
        ny = jnp.where(use_sph, sny, tny)
        nz = jnp.where(use_sph, snz, tnz)

        kind = gb[22]
        alb_r, alb_g, alb_b = gb[23], gb[24], gb[25]
        param = gb[26]
        is_emissive = kind > 0.5

        # --- ONB cosine scatter (mirror path_replay._scatter_from_uniforms)
        phi = _TAU * u1
        sr_ = jnp.sqrt(u2)
        lx = jnp.cos(phi) * sr_
        ly = jnp.sin(phi) * sr_
        lz = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
        big_x = jnp.abs(nx) > 0.9
        ax = jnp.where(big_x, 0.0, 1.0)
        ay = jnp.where(big_x, 1.0, 0.0)
        vx = -nz * ay
        vy = nz * ax
        vz = nx * ay - ny * ax
        # double-where sqrt guard (as `sq` below): d(sqrt)/dx at 0 is inf and
        # the in-kernel vjp would turn a zero cotangent into NaN (0*inf) on
        # padded/degenerate lanes
        vlen_sq = vx * vx + vy * vy + vz * vz
        vlen = jnp.sqrt(jnp.where(vlen_sq > 0.0, vlen_sq, 1.0)) * (
            vlen_sq > 0.0)
        vinv = 1.0 / jnp.where(vlen > 0.0, vlen, 1.0)
        vx, vy, vz = vx * vinv, vy * vinv, vz * vinv
        ux = vy * nz - vz * ny
        uy = vz * nx - vx * nz
        uz = vx * ny - vy * nx
        wix = lx * ux + ly * vx + lz * nx
        wiy = lx * uy + ly * vy + lz * ny
        wiz = lx * uz + ly * vz + lz * nz
        ndotwi = nx * wix + ny * wiy + nz * wiz
        pdf = ndotwi * jnp.float32(1.0 / _PI)
        degen = pdf < pdf_eps
        wix = jnp.where(degen, nx, wix)
        wiy = jnp.where(degen, ny, wiy)
        wiz = jnp.where(degen, nz, wiz)
        pdf = jnp.where(degen, jnp.float32(1.0 / _PI), pdf)
        ndotwi = jnp.where(degen, 1.0, ndotwi)
        cosw = jnp.maximum(0.0, ndotwi)

        # --- Oren-Nayar coeff (mirror path_replay._oren_nayar_coeff) ------
        sigma = jnp.clip(param, 0.0, 1.0)
        s2 = sigma * sigma
        A = 1.0 - 0.5 * s2 / (s2 + 0.33)
        B_ = 0.45 * s2 / (s2 + 0.09)
        wox, woy = -dx, -dy
        li_sq = wix * wix + wiy * wiy
        li = jnp.sqrt(jnp.where(li_sq > 0.0, li_sq, 1.0)) * (li_sq > 0.0)
        lo_sq = wox * wox + woy * woy
        lo = jnp.sqrt(jnp.where(lo_sq > 0.0, lo_sq, 1.0)) * (lo_sq > 0.0)
        ci = jnp.where(li > 1e-12, wix / jnp.where(li > 0, li, 1.0), 1.0)
        si = jnp.where(li > 1e-12, wiy / jnp.where(li > 0, li, 1.0), 0.0)
        co = jnp.where(lo > 1e-12, wox / jnp.where(lo > 0, lo, 1.0), 1.0)
        so = jnp.where(lo > 1e-12, woy / jnp.where(lo > 0, lo, 1.0), 0.0)
        cos_dphi = ci * co + si * so
        cos_to = jnp.clip(-(dx * nx + dy * ny + dz * nz), 0.0, 1.0)
        cos_ti = jnp.clip(cosw, 0.0, 1.0)
        cos_a = jnp.minimum(cos_ti, cos_to)
        cos_b = jnp.maximum(cos_ti, cos_to)
        sin_a_sq = jnp.maximum(1.0 - cos_a * cos_a, 0.0)
        sin_a = jnp.sqrt(jnp.where(sin_a_sq > 0.0, sin_a_sq, 1.0)) * (
            sin_a_sq > 0.0)
        tan_b_sq = jnp.maximum(1.0 - cos_b * cos_b, 0.0)
        # value-exact, gradient floored at grazing incidence (ops.gradsafe)
        tan_b = jnp.sqrt(jnp.where(tan_b_sq > 0.0, tan_b_sq, 1.0)) * (
            tan_b_sq > 0.0) * gradsafe.stable_recip_cos(cos_b)
        coeff = (A + B_ * cos_dphi * sin_a * tan_b) * jnp.float32(1.0 / _PI)

        att_r = jnp.where(is_emissive, param * alb_r, alb_r * coeff)
        att_g = jnp.where(is_emissive, param * alb_g, alb_g * coeff)
        att_b = jnp.where(is_emissive, param * alb_b, alb_b * coeff)
        # exact-gradient constant ratio (ops.gradsafe.cosine_ratio)
        w_pdf = jnp.where(is_emissive, 1.0, gradsafe.cosine_ratio(cosw, pdf))

        a_sky = (dy + 1.0) * 0.5
        sky_r = (1.0 - a_sky) * sbr + a_sky * str_
        sky_g = (1.0 - a_sky) * sbg + a_sky * stg
        sky_b_ = (1.0 - a_sky) * sbb + a_sky * stb

        f_r = jnp.where(hit, w_pdf * att_r, sky_r)
        f_g = jnp.where(hit, w_pdf * att_g, sky_g)
        f_b = jnp.where(hit, w_pdf * att_b, sky_b_)
        cr = cr * jnp.where(active, f_r, 1.0)
        cg = cg * jnp.where(active, f_g, 1.0)
        cb = cb * jnp.where(active, f_b, 1.0)

        next_active = active & hit & ~is_emissive
        ox = jnp.where(next_active, px + shadow_eps * nx, ox)
        oy = jnp.where(next_active, py + shadow_eps * ny, oy)
        oz = jnp.where(next_active, pz + shadow_eps * nz, oz)
        dx = jnp.where(next_active, wix, dx)
        dy = jnp.where(next_active, wiy, dy)
        dz = jnp.where(next_active, wiz, dz)

    return (ox, oy, oz), (dx, dy, dz), (cr, cg, cb), next_active


def _chain(o, d, g, flags, urand, sky, *, max_depth, t_min, shadow_eps,
           pdf_eps):
    """The replay bounce chain on per-component blocks.

    Args:
      o, d: lists of 3 (8, L) components each.
      g: list of max_depth lists of G_ROWS (8, L) components.
      flags: list of max_depth (use_sph, hit) pairs, (8, L) float blocks.
      urand: list of max_depth (u1, u2) pairs.
      sky: (skyb_r, skyb_g, skyb_b, skyt_r, skyt_g, skyt_b) — (8, L) blocks
        or scalars.
    Returns (cr, cg, cb).
    """
    one = jnp.ones_like(o[0])
    st_o, st_d, st_c = tuple(o), tuple(d), (one, one, one)
    active = one > 0.0
    for b in range(max_depth):
        st_o, st_d, st_c, active = _chain_bounce(
            st_o, st_d, st_c, active, g[b], flags[b], urand[b], sky,
            t_min=t_min, shadow_eps=shadow_eps, pdf_eps=pdf_eps)
    return st_c


def _split_inputs(rays_ref, g_ref, flags_ref, urand_ref, sky_ref, max_depth):
    o = [rays_ref[c] for c in range(3)]
    d = [rays_ref[c + 3] for c in range(3)]
    g = [[g_ref[b * G_ROWS + r] for r in range(G_ROWS)]
         for b in range(max_depth)]
    flags = [(flags_ref[2 * b], flags_ref[2 * b + 1])
             for b in range(max_depth)]
    urand = [(urand_ref[2 * b], urand_ref[2 * b + 1])
             for b in range(max_depth)]
    sky = tuple(sky_ref[i] for i in range(6))
    return o, d, g, flags, urand, sky


def _fwd_kernel(sky_ref, rays_ref, g_ref, flags_ref, urand_ref, out_ref, *,
                max_depth, t_min, shadow_eps, pdf_eps):
    o, d, g, flags, urand, sky = _split_inputs(
        rays_ref, g_ref, flags_ref, urand_ref, sky_ref, max_depth)
    cr, cg, cb = _chain(o, d, g, flags, urand, sky, max_depth=max_depth,
                        t_min=t_min, shadow_eps=shadow_eps, pdf_eps=pdf_eps)
    out_ref[0] = cr
    out_ref[1] = cg
    out_ref[2] = cb
    out_ref[3] = jnp.zeros_like(cr)


def _bwd_kernel(sky_ref, rays_ref, g_ref, flags_ref, urand_ref, dcol_ref,
                drays_ref, dg_ref, dsky_ref, *,
                max_depth, t_min, shadow_eps, pdf_eps):
    """Recompute the chain and reverse it in one fused pass (in-kernel vjp).

    Grads w.r.t. sky are emitted per-ray (summed outside): the six dsky rows
    are the per-ray cotangents of (sky_bottom, sky_top)."""
    o, d, g, flags, urand, sky = _split_inputs(
        rays_ref, g_ref, flags_ref, urand_ref, sky_ref, max_depth)
    # broadcast sky scalars to blocks so vjp returns per-ray cotangents
    shape = rays_ref.shape[1:]
    sky_blk = tuple(jnp.full(shape, s, jnp.float32) for s in sky)

    def f(o, d, g, sky_blk):
        return _chain(o, d, g, flags, urand, sky_blk, max_depth=max_depth,
                      t_min=t_min, shadow_eps=shadow_eps, pdf_eps=pdf_eps)

    _, vjp = jax.vjp(f, o, d, g, sky_blk)
    do, dd, dg, dsky = vjp((dcol_ref[0], dcol_ref[1], dcol_ref[2]))
    for c in range(3):
        drays_ref[c] = do[c]
        drays_ref[c + 3] = dd[c]
    drays_ref[6] = jnp.zeros(shape, jnp.float32)
    drays_ref[7] = jnp.zeros(shape, jnp.float32)
    for b in range(max_depth):
        for r in range(G_ROWS):
            dg_ref[b * G_ROWS + r] = dg[b][r]
    for i in range(6):
        dsky_ref[i] = dsky[i]
    dsky_ref[6] = jnp.zeros(shape, jnp.float32)
    dsky_ref[7] = jnp.zeros(shape, jnp.float32)


def _specs(rows, lanes):
    return pl.BlockSpec((rows, _SUB, lanes), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)


@functools.partial(
    jax.jit, static_argnames=("max_depth", "t_min", "shadow_eps", "pdf_eps",
                              "lanes", "interpret"))
def _fwd_call(sky, rays, g, flags, urand, *, max_depth, t_min, shadow_eps,
              pdf_eps, lanes, interpret):
    L = rays.shape[2]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, max_depth=max_depth, t_min=t_min,
                          shadow_eps=shadow_eps, pdf_eps=pdf_eps),
        grid=(L // lanes,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _specs(8, lanes),
            _specs(G_ROWS * max_depth, lanes),
            _specs(2 * max_depth, lanes),
            _specs(2 * max_depth, lanes),
        ],
        out_specs=_specs(4, lanes),
        out_shape=jax.ShapeDtypeStruct((4, _SUB, L), jnp.float32),
        interpret=interpret,
    )(sky, rays, g, flags, urand)


@functools.partial(
    jax.jit, static_argnames=("max_depth", "t_min", "shadow_eps", "pdf_eps",
                              "lanes", "interpret"))
def _bwd_call(sky, rays, g, flags, urand, dcol, *, max_depth, t_min,
              shadow_eps, pdf_eps, lanes, interpret):
    L = rays.shape[2]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, max_depth=max_depth, t_min=t_min,
                          shadow_eps=shadow_eps, pdf_eps=pdf_eps),
        grid=(L // lanes,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _specs(8, lanes),
            _specs(G_ROWS * max_depth, lanes),
            _specs(2 * max_depth, lanes),
            _specs(2 * max_depth, lanes),
            _specs(4, lanes),
        ],
        out_specs=[
            _specs(8, lanes),
            _specs(G_ROWS * max_depth, lanes),
            _specs(8, lanes),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, _SUB, L), jnp.float32),
            jax.ShapeDtypeStruct((G_ROWS * max_depth, _SUB, L), jnp.float32),
            jax.ShapeDtypeStruct((8, _SUB, L), jnp.float32),
        ],
        interpret=interpret,
    )(sky, rays, g, flags, urand, dcol)


@functools.lru_cache(maxsize=None)
def _make_core(max_depth, t_min, shadow_eps, pdf_eps, lanes, interpret):
    kw = dict(max_depth=max_depth, t_min=t_min, shadow_eps=shadow_eps,
              pdf_eps=pdf_eps, lanes=lanes, interpret=interpret)

    @jax.custom_vjp
    def core(rays, g, flags, urand, sky):
        out = _fwd_call(sky, rays, g, flags, urand, **kw)
        return out[:3]

    def fwd(rays, g, flags, urand, sky):
        return core(rays, g, flags, urand, sky), (rays, g, flags, urand, sky)

    def bwd(res, dcol):
        rays, g, flags, urand, sky = res
        dcol4 = jnp.concatenate(
            [dcol, jnp.zeros((1,) + dcol.shape[1:], dcol.dtype)], axis=0)
        drays, dg, dsky_rows = _bwd_call(sky, rays, g, flags, urand, dcol4,
                                         **kw)
        dsky = jnp.sum(dsky_rows[:6], axis=(1, 2))
        return (drays, dg, jnp.zeros_like(flags), jnp.zeros_like(urand), dsky)

    core.defvjp(fwd, bwd)
    return core


def replay_core(rays, g, flags, urand, sky, config, interpret=False,
                lanes=_LANES):
    """Differentiable replay chain on planar blocks.

    Args:
      rays: (8, 8, L) — rows o.xyz, d.xyz, 2 pad; lane-chunked planar.
      g: (G_ROWS*max_depth, 8, L) gathered winner rows per bounce.
      flags: (2*max_depth, 8, L) — rows (use_sph, hit) per bounce.
      urand: (2*max_depth, 8, L) scatter uniforms.
      sky: (6,) — sky_bottom.rgb ++ sky_top.rgb (differentiable).
      config: RenderConfig (static fields only).
    Returns color (3, 8, L); gradients flow to rays, g, sky.
    """
    core = _make_core(config.max_depth, float(config.t_min),
                      float(config.shadow_eps), float(config.pdf_eps),
                      lanes, bool(interpret))
    return core(rays, g, flags, urand, sky)
