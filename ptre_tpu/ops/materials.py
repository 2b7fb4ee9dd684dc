"""Differentiable BSDF / material evaluation.

TPU-native equivalent of `IoniqRE/material.{h,cu}` + `IoniqRE/onb.h`: the
virtual `material::scatter` dispatch becomes masked branchless evaluation over
a material table (kind, albedo, param) gathered per ray — `lax.switch`-free
since both kinds are cheap and `jnp.where` keeps lanes full.

Semantics preserved exactly:
  * oren_nayar (`material.cu:5-43`): ONB cosine-weighted hemisphere sample;
    scattered origin offset p + 1e-4 n; pdf = n·wi/π with the degenerate-pdf
    fallback (pdf < 1e-5 → cast along the normal with pdf = 1/π,
    `material.cu:15-18`); cos_law_weight = max(0, n·wi); full A/B term with
    WORLD-space azimuthal angles atan2(w.y, w.x) — faithfully reproducing the
    reference's frame choice; sigma clamped to [0,1] (`material.h:25-30`);
    attenuation = albedo * coeff / π.
  * emissive (`material.cu:50-62`): terminal; attenuation = strength * color,
    pdf = cos_law_weight = 1. Emission is modeled as a terminal multiplicative
    "attenuation", not added radiance — the reference's integrator contract
    (`path_tracer.cu:297-305,320-326`).
"""

from __future__ import annotations

from flax import struct
import jax.numpy as jnp

from ptre_tpu.ops import rng
from ptre_tpu.ops.vecmat import pi

KIND_OREN_NAYAR = 0
KIND_EMISSIVE = 1


@struct.dataclass
class ScatterRecord:
    """Vectorized scatter_record (reference `material.h:7-12`) + next ray."""

    attenuation: jnp.ndarray  # (R, 3)
    pdf: jnp.ndarray  # (R,)
    cos_weight: jnp.ndarray  # (R,)
    next_origin: jnp.ndarray  # (R, 3)
    next_dir: jnp.ndarray  # (R, 3)
    terminated: jnp.ndarray  # (R,) bool — emissive ends the path


def scatter(
    key,
    d_in,
    hit_p,
    hit_n,
    mat_kind,
    mat_albedo,
    mat_param,
    shadow_eps: float = 1e-4,
    pdf_eps: float = 1e-5,
) -> ScatterRecord:
    """Evaluate scatter for every ray's hit material, branchlessly.

    Args:
      key: PRNG key for this bounce (array draws differ per ray).
      d_in: (R, 3) incoming ray unit directions.
      hit_p, hit_n: (R, 3) hit position and (unit, front-facing) normal.
      mat_kind: (R,) int32 material kinds gathered from the table.
      mat_albedo: (R, 3); mat_param: (R,) sigma or strength.
    """
    R = d_in.shape[0]
    wo = -d_in

    # --- oren_nayar sampling (`material.cu:7-18`) -------------------------
    basis = rng.onb_from_normal(hit_n)  # (R, 3, 3) rows u, v, w
    local = rng.cosine_weighted(key, (R,))  # (R, 3) z-up
    wi = jnp.einsum("rk,rkj->rj", local, basis)

    pdf = jnp.einsum("rk,rk->r", hit_n, wi) / pi
    degen = pdf < pdf_eps
    wi = jnp.where(degen[:, None], hit_n, wi)
    pdf = jnp.where(degen, 1.0 / pi, pdf)
    cos_weight = jnp.maximum(0.0, jnp.einsum("rk,rk->r", hit_n, wi))

    # --- oren_nayar BRDF value (`material.cu:20-41`) ----------------------
    sigma = jnp.clip(mat_param, 0.0, 1.0)
    sigma2 = sigma * sigma
    A = 1.0 - 0.5 * sigma2 / (sigma2 + 0.33)
    B = 0.45 * sigma2 / (sigma2 + 0.09)

    # arccos has an infinite derivative at 1; clamp just inside so gradients
    # stay finite (value change ~4e-4 rad, far below float32 shading noise)
    def safe_arccos0(x):
        return jnp.arccos(jnp.clip(x, 0.0, 1.0 - 1e-7))

    phi_o = jnp.arctan2(wo[:, 1], wo[:, 0])
    phi_i = jnp.arctan2(wi[:, 1], wi[:, 0])
    costheta_o = jnp.maximum(0.0, jnp.einsum("rk,rk->r", wo, hit_n))
    theta_o = jnp.where(costheta_o > 1.0, 0.0, safe_arccos0(costheta_o))
    costheta_i = jnp.maximum(0.0, jnp.einsum("rk,rk->r", wi, hit_n))
    theta_i = jnp.where(costheta_i > 1.0, 0.0, safe_arccos0(costheta_i))
    alpha = jnp.maximum(theta_i, theta_o)
    beta = jnp.minimum(theta_i, theta_o)

    coeff = A + B * jnp.cos(phi_i - phi_o) * jnp.sin(alpha) * jnp.tan(beta)
    on_attenuation = mat_albedo * (coeff / pi)[:, None]

    # --- emissive (`material.cu:50-57`) -----------------------------------
    em_attenuation = mat_param[:, None] * mat_albedo

    is_emissive = mat_kind == KIND_EMISSIVE
    attenuation = jnp.where(is_emissive[:, None], em_attenuation, on_attenuation)
    pdf = jnp.where(is_emissive, 1.0, pdf)
    cos_weight = jnp.where(is_emissive, 1.0, cos_weight)

    next_origin = hit_p + shadow_eps * hit_n
    return ScatterRecord(
        attenuation=attenuation,
        pdf=pdf,
        cos_weight=cos_weight,
        next_origin=next_origin,
        next_dir=wi,
        terminated=is_emissive,
    )


def emitted(mat_kind, mat_albedo, mat_param):
    """Emitted radiance per material row (reference `material.cu:59-62`):
    strength * color for EMISSIVE, zero otherwise."""
    e = mat_param[..., None] * mat_albedo
    return jnp.where((mat_kind == KIND_EMISSIVE)[..., None], e, 0.0)


def sky_attenuation(d, sky_bottom, sky_top):
    """Miss shading: vertical gradient (`path_tracer.cu:307-316`).

    a = (dir.y + 1)/2; attenuation = (1-a)*bottom + a*top; pdf = weight = 1.
    """
    a = (d[:, 1] + 1.0) * 0.5
    bottom = jnp.asarray(sky_bottom, jnp.float32)
    top = jnp.asarray(sky_top, jnp.float32)
    return (1.0 - a)[:, None] * bottom + a[:, None] * top
