"""Differentiable path replay over fused-kernel-recorded selections.

The fast gradient design for the BASELINE headline metric (forward+backward
Mrays/s at 1080p): the staged integrator's per-bounce O(R*P) closest-hit
sweep is detached (stop-gradient) anyway — discrete visibility is treated as
locally constant, `ops.intersect.closest_hit` — so nothing is lost by moving
the ENTIRE sweep into the fused Pallas megakernel and keeping only the O(R*B)
differentiable tail in XLA:

  1. `megakernel.trace_fused_sel` traces the whole path on-chip with external
     (threefry) scatter uniforms and records, per bounce, the winning
     primitive selection (tri index, sphere index, use_sph, hit);
  2. `replay` (here) rebuilds the identical path in pure XLA from those
     selections + the same uniforms: per bounce it gathers ONE primitive per
     ray, re-derives (t, position, normal) differentiably
     (`intersect.triangle_hit_attrs_t` / `sphere_hit_attrs_t`), applies the
     same ONB cosine scatter and Oren-Nayar/emissive weights
     (`material.cu:5-62` semantics), and accumulates the multiplicative
     throughput exactly like `integrator.trace`.

`jax.grad` through `replay` gives gradients w.r.t. transforms, geometry,
materials, camera — with the selection indices as constants, which is the
same detached-sampling estimator as the staged path, at a fraction of the
forward cost (the sweep never enters autodiff, and the backward pass only
sees O(R*B) work).

Scatter math is kept bit-compatible with `megakernel._scatter_shade` (same
formulas, same order) so the replayed path follows the kernel's selections
consistently; `tests/test_path_replay.py` pins replay == staged-integrator
equality under matched uniforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ptre_tpu.ops import gradsafe
from ptre_tpu.ops import rng as _rng
from ptre_tpu.ops.intersect import sphere_hit_attrs_t, triangle_hit_attrs_t
from ptre_tpu.utils.config import RenderConfig
from ptre_tpu.utils.backend import is_tpu_backend

_PI = 3.14159265358979
_TAU = 2.0 * _PI


def _scatter_from_uniforms(n, d, u1, u2, pdf_eps):
    """ONB cosine-weighted scatter from supplied uniforms.

    Vectorized twin of the kernel's `_scatter_shade` sampling stage
    (`onb.h:7-21` basis, `random.cu:96-107` cosine draw, degenerate-pdf
    fallback `material.cu:15-18`). Returns (wi, pdf, cos_weight).
    """
    phi = _TAU * u1
    sr = jnp.sqrt(u2)
    lx = jnp.cos(phi) * sr
    ly = jnp.sin(phi) * sr
    lz = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))

    nx, ny, nz = n[:, 0], n[:, 1], n[:, 2]
    # pinned branch decisions (remat-stable backward, ops/gradsafe.py)
    big_x = gradsafe.remat_pin(jnp.abs(nx) > 0.9)
    ax = jnp.where(big_x, 0.0, 1.0)
    ay = jnp.where(big_x, 1.0, 0.0)
    vx = -nz * ay
    vy = nz * ax
    vz = nx * ay - ny * ax
    # double-where sqrt guards here and below: d(sqrt)/dx at 0 is inf, and
    # reverse-mode turns zero cotangents into NaN (0*inf) on degenerate lanes
    vlen_sq = vx * vx + vy * vy + vz * vz
    vlen = jnp.sqrt(jnp.where(vlen_sq > 0.0, vlen_sq, 1.0)) * (vlen_sq > 0.0)
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
    degen = gradsafe.remat_pin(pdf < pdf_eps)
    wix = jnp.where(degen, nx, wix)
    wiy = jnp.where(degen, ny, wiy)
    wiz = jnp.where(degen, nz, wiz)
    pdf = jnp.where(degen, jnp.float32(1.0 / _PI), pdf)
    ndotwi = jnp.where(degen, 1.0, ndotwi)
    cosw = jnp.maximum(0.0, ndotwi)
    wi = jnp.stack([wix, wiy, wiz], axis=-1)
    return wi, pdf, cosw


def _oren_nayar_coeff(n, d, wi, cosw, sigma):
    """Oren-Nayar A/B scalar coefficient, transcendental-free
    (`material.cu:20-41` via the kernel's planar-projection identity)."""
    s2 = sigma * sigma
    A = 1.0 - 0.5 * s2 / (s2 + 0.33)
    B = 0.45 * s2 / (s2 + 0.09)
    wo = -d
    li_sq = wi[:, 0] ** 2 + wi[:, 1] ** 2
    li = jnp.sqrt(jnp.where(li_sq > 0.0, li_sq, 1.0)) * (li_sq > 0.0)
    lo_sq = wo[:, 0] ** 2 + wo[:, 1] ** 2
    lo = jnp.sqrt(jnp.where(lo_sq > 0.0, lo_sq, 1.0)) * (lo_sq > 0.0)
    ci = jnp.where(li > 1e-12, wi[:, 0] / jnp.where(li > 0, li, 1.0), 1.0)
    si = jnp.where(li > 1e-12, wi[:, 1] / jnp.where(li > 0, li, 1.0), 0.0)
    co = jnp.where(lo > 1e-12, wo[:, 0] / jnp.where(lo > 0, lo, 1.0), 1.0)
    so = jnp.where(lo > 1e-12, wo[:, 1] / jnp.where(lo > 0, lo, 1.0), 0.0)
    cos_dphi = ci * co + si * so
    cos_to = jnp.clip(jnp.einsum("rk,rk->r", wo, n), 0.0, 1.0)
    cos_ti = jnp.clip(cosw, 0.0, 1.0)
    cos_a = jnp.minimum(cos_ti, cos_to)
    cos_b = jnp.maximum(cos_ti, cos_to)
    sin_a_sq = jnp.maximum(1.0 - cos_a * cos_a, 0.0)
    sin_a = jnp.sqrt(jnp.where(sin_a_sq > 0.0, sin_a_sq, 1.0)) * (
        sin_a_sq > 0.0)
    tan_b_sq = jnp.maximum(1.0 - cos_b * cos_b, 0.0)
    # value-exact, gradient floored at grazing incidence (gradsafe)
    tan_b = jnp.sqrt(jnp.where(tan_b_sq > 0.0, tan_b_sq, 1.0)) * (
        tan_b_sq > 0.0) * gradsafe.stable_recip_cos(cos_b)
    return (A + B * cos_dphi * sin_a * tan_b) * jnp.float32(1.0 / _PI)


def _onehot_gather(idx, table):
    """TPU-native row gather: ``one_hot(idx) @ table``.

    XLA lowers dynamic gathers to scalar loops on TPU (≈100x slower than
    compute at 2M rays); a one-hot matmul instead rides the MXU with the
    one-hot fused into the operand — the same trick the fused kernel uses
    for its winner-attribute fetch. Backward is ``one_hotᵀ @ cotangent``,
    an equally fast scatter-add matmul.
    """
    oh = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
    return oh @ table


def _pack_rows(rows, lanes):
    """(C, R) → (C, 8, L) lane-chunked planar blocks, zero-padded."""
    C, R = rows.shape
    block = 8 * lanes
    pad = (-R) % block
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
    L = rows.shape[1] // 8
    return rows.reshape(C, 8, L)


def _replay_pallas(o, d, sel, urand, table, T, sky6, config: RenderConfig,
                   interpret=False):
    """Pallas-core replay: XLA does the one-hot MXU gathers (and therefore
    the table-gradient transpose matmuls); the Pallas kernels fuse the whole
    elementwise chain fwd+bwd (`ops.pallas.replay_kernel`)."""
    from ptre_tpu.ops.pallas import replay_kernel as rk

    R = o.shape[0]
    P = table.shape[0]
    B = config.max_depth
    tableT = table.T  # (27, P)

    g_rows = []
    flag_rows = []
    for b in range(B):
        sel_b = sel[b]
        i_tri = jax.lax.stop_gradient(sel_b[0].astype(jnp.int32))
        i_sph = jax.lax.stop_gradient(sel_b[1].astype(jnp.int32))
        use_sph = sel_b[2] > 0.5
        idx = jnp.where(use_sph, T + i_sph, i_tri)
        # transposed one-hot gather: (27, P) @ (P, R) — the winner rows land
        # directly in the kernel's planar row layout, no (R, 27) transpose
        ohT = (jnp.arange(P, dtype=jnp.int32)[:, None] == idx[None, :]
               ).astype(jnp.float32)
        g_rows.append(tableT @ ohT)  # (27, R)
        flag_rows.append(sel_b[2])
        flag_rows.append(sel_b[3])

    lanes = rk._LANES
    rays = _pack_rows(
        jnp.concatenate([o.T, d.T, jnp.zeros((2, R), jnp.float32)]), lanes)
    g = _pack_rows(jnp.concatenate(g_rows, axis=0), lanes)
    flags = _pack_rows(jnp.stack(flag_rows), lanes)
    ur = _pack_rows(urand.reshape(2 * B, R), lanes)

    color = rk.replay_core(rays, g, flags, ur, sky6, config,
                           interpret=interpret)
    return color.reshape(3, -1)[:, :R].T


def _build_table(packet):
    """Unified (T+S, 27) primitive table — [v0 v1 v2 n0 n1 n2 | center r |
    kind albedo param], zeros in the other class's columns. Returns
    (table, T, sky6); all leaves differentiable."""
    v0, v1, v2, n0, n1, n2 = packet.world_triangles()
    T = v0.shape[0]
    S = packet.sph_center.shape[0]
    mat_cols = jnp.concatenate(
        [packet.mat_kind.astype(jnp.float32)[:, None], packet.mat_albedo,
         packet.mat_param[:, None]], axis=1,
    )  # (M, 5): kind, albedo.rgb, param
    tri_rows = jnp.concatenate(
        [v0, v1, v2, n0, n1, n2, jnp.zeros((T, 4), jnp.float32),
         mat_cols[packet.tri_mat]], axis=1,
    )  # (T, 27)
    sph_rows = jnp.concatenate(
        [jnp.zeros((S, 18), jnp.float32), packet.sph_center,
         packet.sph_radius[:, None], mat_cols[packet.sph_mat]], axis=1,
    )  # (S, 27)
    table = jnp.concatenate([tri_rows, sph_rows], axis=0)
    sky6 = jnp.concatenate([
        jnp.asarray(packet.sky_bottom, jnp.float32),
        jnp.asarray(packet.sky_top, jnp.float32)])
    return table, T, sky6


def _replay_pallas_planar(o, d, sel_p, urand_p, table, T, sky6,
                          config: RenderConfig, interpret=False):
    """Planar-native Pallas replay: sel/urand stay in the fused kernel's
    (rows, 8, L) lane-chunked layout end-to-end, so the only XLA work per
    bounce is the one-hot winner-row `dot_general` — no (R,)-major
    relayouts of the selection/uniform data at all (measured: the relayouts
    were ~2/3 of the replay forward, docs/PERF.md)."""
    from ptre_tpu.ops.pallas import replay_kernel as rk

    R = o.shape[0]
    P = table.shape[0]
    B = config.max_depth
    tableT = table.T  # (27, P)
    iota_p = jnp.arange(P, dtype=jnp.int32)[:, None, None]

    # Padded lanes (planar index sub*L + lane >= R) carry sel=0, which would
    # alias them onto primitive 0: their (possibly non-finite) replay
    # cotangents would be transpose-scattered into REAL table rows. Mask them
    # out of the one-hot (→ zero g rows, zero table-grad columns) and kill
    # their flags so they take the inert sky branch.
    Lp = sel_p.shape[2]
    lane_id = (jnp.arange(8, dtype=jnp.int32)[:, None] * Lp
               + jnp.arange(Lp, dtype=jnp.int32)[None, :])  # (8, L)
    valid = lane_id < R
    validf = valid.astype(jnp.float32)

    g_list = []
    flag_rows = []
    for b in range(B):
        i_tri = jax.lax.stop_gradient(sel_p[4 * b + 0].astype(jnp.int32))
        i_sph = jax.lax.stop_gradient(sel_p[4 * b + 1].astype(jnp.int32))
        use_sph = sel_p[4 * b + 2] > 0.5
        idx = jnp.where(use_sph, T + i_sph, i_tri)  # (8, L)
        ohT = ((iota_p == idx[None]) & valid[None]).astype(jnp.float32)
        # contract P, keep (8, L) free: winner rows land planar directly
        g_list.append(jax.lax.dot_general(
            tableT, ohT, (((1,), (0,)), ((), ()))))  # (27, 8, L)
        flag_rows.append(sel_p[4 * b + 2] * validf)
        flag_rows.append(sel_p[4 * b + 3] * validf)

    # rays must use the SEL kernel's planar mapping r = sublane*L + lane —
    # pad to its exact 8*L total before the (8, L) split
    Ls = sel_p.shape[2]
    lanes = rk._LANES if Ls % rk._LANES == 0 else 128
    assert Ls % lanes == 0, (Ls, lanes)
    rows = jnp.concatenate([o.T, d.T, jnp.zeros((2, R), jnp.float32)])
    rows = jnp.pad(rows, ((0, 0), (0, 8 * Ls - R)))
    rays = rows.reshape(8, 8, Ls)
    g = jnp.concatenate(g_list, axis=0)
    flags = jnp.stack(flag_rows)

    color = rk.replay_core(rays, g, flags, urand_p, sky6, config,
                           interpret=interpret, lanes=lanes)
    return color.reshape(3, -1)[:, :R].T


def replay(o, d, sel, urand, packet, config: RenderConfig, backend="auto"):
    """Differentiable replay of recorded paths → linear color (R, 3).

    Args:
      o, d: (R, 3) primary rays (differentiable, e.g. from camera params).
      sel: (max_depth, 4, R) kernel-recorded selections (treated as ints).
      urand: (2*max_depth, R) the scatter uniforms the kernel consumed.
      packet: ScenePacket (differentiable leaves: transforms, spheres,
        materials, sky).
      config: RenderConfig.

    Both primitive classes live in ONE unified (T+S, 27) table —
    [v0 v1 v2 n0 n1 n2 | center radius | kind albedo param] with zeros in
    the other class's columns — so each bounce does a single one-hot MXU
    gather (row = winner), and both attr paths are derived from that one
    row and class-selected. Measured on the v5e this is 1.75x faster
    fwd+bwd than two per-class gathers through a remat'd scan (69 ms vs
    120 ms per 1080p bounce set, docs/artifacts/BWD_BREAKDOWN.json); the
    bounce loop is unrolled (`lax.scan` unroll=max_depth) so XLA fuses
    across bounces instead of round-tripping the carry through HBM.
    """
    table, T, sky6 = _build_table(packet)
    sky_b, sky_t = sky6[:3], sky6[3:]

    if backend == "auto":
        backend = ("pallas" if is_tpu_backend()
                   else "xla")
    if backend in ("pallas", "pallas-interpret"):
        return _replay_pallas(o, d, sel, urand, table, T, sky6, config,
                              interpret=(backend == "pallas-interpret"))

    urand = urand.reshape(config.max_depth, 2, -1)

    def bounce(carry, inputs):
        o, d, color, active = carry
        sel_b, u_b = inputs
        i_tri = jax.lax.stop_gradient(sel_b[0].astype(jnp.int32))
        i_sph = jax.lax.stop_gradient(sel_b[1].astype(jnp.int32))
        use_sph = sel_b[2] > 0.5
        hit = sel_b[3] > 0.5

        idx = jnp.where(use_sph, T + i_sph, i_tri)
        g = _onehot_gather(idx, table)
        # both attr paths from the single gathered row; the other class's
        # columns are zero (guarded: det==0 in the MT recompute, radius==0
        # in the sphere recompute) and the results class-selected
        _, p_tri, n_tri, _ = triangle_hit_attrs_t(
            o, d, g[:, 0:3], g[:, 3:6], g[:, 6:9],
            g[:, 9:12], g[:, 12:15], g[:, 15:18],
        )
        _, p_sph, n_sph, _ = sphere_hit_attrs_t(
            o, d, g[:, 18:21], g[:, 21], config.t_min
        )
        p = jnp.where(use_sph[:, None], p_sph, p_tri)
        n = jnp.where(use_sph[:, None], n_sph, n_tri)

        kind = g[:, 22]
        albedo = g[:, 23:26]
        param = g[:, 26]
        is_emissive = kind > 0.5

        wi, pdf, cosw = _scatter_from_uniforms(n, d, u_b[0], u_b[1],
                                               config.pdf_eps)
        sigma = jnp.clip(param, 0.0, 1.0)
        coeff = _oren_nayar_coeff(n, d, wi, cosw, sigma)
        att = jnp.where(
            is_emissive[:, None], param[:, None] * albedo, albedo * coeff[:, None]
        )
        # exact-gradient constant ratio (ops.gradsafe.cosine_ratio)
        w_pdf = jnp.where(is_emissive, 1.0, gradsafe.cosine_ratio(cosw, pdf))

        a_sky = (d[:, 1] + 1.0) * 0.5
        sky = (1.0 - a_sky)[:, None] * sky_b + a_sky[:, None] * sky_t

        factor = jnp.where(hit[:, None], w_pdf[:, None] * att, sky)
        color = color * jnp.where(active[:, None], factor, 1.0)

        next_active = active & hit & ~is_emissive
        o = jnp.where(next_active[:, None], p + config.shadow_eps * n, o)
        d = jnp.where(next_active[:, None], wi, d)
        return (o, d, color, next_active), None

    if config.remat_replay:
        bounce = jax.checkpoint(bounce)

    R = o.shape[0]
    init = (o, d, jnp.ones((R, 3), jnp.float32), jnp.ones((R,), bool))
    (_, _, color, _), _ = jax.lax.scan(
        bounce, init, (sel, urand), unroll=config.max_depth
    )
    return color


def trace_fused_grad(key, o, d, packet, config: RenderConfig,
                     interpret=None):
    """Differentiable trace with the O(R*P) sweep fused on-chip.

    Drop-in replacement for `integrator.trace` on scenes the dense megakernel
    supports: the fused kernel records path selections (under stop_gradient),
    then `replay` rebuilds the path differentiably. Same detached-visibility
    gradient estimator as the staged path; identical output distribution
    (threefry uniforms keyed identically to `trace_fused(key=...)`).
    """
    from ptre_tpu.ops.pallas import megakernel

    if interpret is None:  # Pallas interpret mode off-TPU (CPU tests)
        interpret = not is_tpu_backend()
    sg = jax.lax.stop_gradient
    on_tpu = is_tpu_backend()
    if on_tpu and not interpret:
        # planar fast path: selections/uniforms stay in the kernel's
        # (rows, 8, L) layout straight into the Pallas replay core
        sel_p, urand_p = megakernel.trace_fused_sel(
            key, sg(o), sg(d), jax.tree.map(sg, packet), config,
            interpret=False, planar=True,
        )
        table, T, sky6 = _build_table(packet)
        return _replay_pallas_planar(o, d, sel_p, urand_p, table, T, sky6,
                                     config)
    sel, urand = megakernel.trace_fused_sel(
        key, sg(o), sg(d), jax.tree.map(sg, packet), config,
        interpret=interpret,
    )
    return replay(o, d, sel, urand, packet, config)
