"""Path-tracing integrator: fixed-depth masked bounce scan.

TPU-native equivalent of `ray_color` (`IoniqRE/path_tracer.cu:231-328`): the
reference's per-thread iterative loop with a fixed scatter_record stack and
early break becomes a `lax.scan` over bounces carrying (ray, running product,
active mask) — TPUs have no per-thread control flow, so terminated rays are
masked lanes whose product multiplier is 1.

The integrator contract (base formula Lo = Li * bsdf * (n·wi) / pdf, folded
multiplicatively over the stack at `path_tracer.cu:320-326`) is preserved:

  * per bounce, the contribution factor is cos_weight / pdf * attenuation;
  * an emissive hit terminates the path, its strength*color entering as the
    final multiplicative factor (`path_tracer.cu:297-305`);
  * a miss terminates with the sky gradient factor (`path_tracer.cu:307-316`);
  * a path still alive after max_depth bounces contributes just the product of
    its scatter factors (no sky/emission term) — exactly the reference's
    stack-exhaustion behavior.

Gradients flow through hit geometry, materials, transforms and camera; the
discrete hit selection (argmin index, hit/termination masks) is naturally
piecewise-constant so `jax.grad` treats it as locally constant — the standard
detached-sampling estimator for path-traced derivatives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ptre_tpu.ops import gradsafe, materials, rng
from ptre_tpu.ops.intersect import closest_hit
from ptre_tpu.utils.config import RenderConfig
from ptre_tpu.utils.backend import is_tpu_backend


def _select_sweep(config: RenderConfig):
    """Pick the closest-hit sweep backend (Pallas TPU kernel vs XLA)."""
    backend = config.intersect_backend
    if backend == "auto":
        backend = "pallas" if is_tpu_backend() else "xla"
    if backend == "pallas":
        from ptre_tpu.ops.pallas import intersect_kernel

        return intersect_kernel.sweep
    return None  # ops.intersect.sweep default


def _grad_route(config: RenderConfig, packet) -> str:
    """Route differentiable traces:

    * "fused"  — fully-fused custom-VJP path (`ops.pallas.fused_grad`):
      recording megakernel forward + single-kernel backward. The production
      TPU route for every scene the megakernel `supports()` (dense serial
      sweep for demo-class scenes, culled lane-parallel for triangle scenes).
    * "replay" — round-2 planar replay (`ops.path_replay.trace_fused_grad`),
      kept for A/B validation; dense scenes only.
    * "staged" — per-bounce XLA sweep + autodiff; always available.
    """
    from ptre_tpu.ops.pallas import fused_grad, megakernel, wavefront

    def fused_ok():
        # a fused forward exists (dense megakernel or wavefront) AND the
        # backward kernel's resident table + gradient accumulator fit the
        # VMEM budget
        fwd = megakernel.dense_supported(packet) or wavefront.supports(packet)
        return fwd and fused_grad.fits(packet, config.max_depth)

    mode = config.grad_sweep
    if mode == "staged":
        return "staged"
    if mode == "replay":
        return "replay" if megakernel.dense_supported(packet) else "staged"
    if mode == "fused":
        return "fused" if fused_ok() else "staged"
    # auto: fused on TPU whenever the megakernel takes the scene
    if is_tpu_backend() and fused_ok():
        return "fused"
    return "staged"


def trace(key, origins, directions, packet, config: RenderConfig,
          screen_cam=None):
    """Trace one sample per ray → linear color (R, 3).

    Args:
      key: per-(frame, sample) PRNG key; bounce keys are folded from it.
      origins, directions: (R, 3) primary rays (unit directions).
      packet: ScenePacket.
      config: RenderConfig (max_depth, t range, sky, epsilons).
      screen_cam: optional Camera whose jittered per-pixel rays
        (origins, directions) are, in row-major order — lets the
        triangle-scale fused route bin bounce 0 in screen space
        (`wavefront.trace`). Purely an acceleration hint; the image is
        unchanged.
    """
    route = _grad_route(config, packet)
    if route == "fused":
        from ptre_tpu.ops.pallas import fused_grad

        return fused_grad.trace_grad(key, origins, directions, packet,
                                     config, screen_cam=screen_cam)
    if route == "replay":
        from ptre_tpu.ops import path_replay

        return path_replay.trace_fused_grad(
            key, origins, directions, packet, config
        )

    world_tris = packet.world_triangles()  # hoisted: shared across bounces
    sweep_fn = _select_sweep(config)

    def bounce(carry, b):
        o, d, color, active = carry
        hit = closest_hit(
            o, d, packet, world_tris, config.t_min, config.t_max, config.det_eps,
            sweep_fn=sweep_fn,
        )

        bkey = rng.fold(key, b)
        srec = materials.scatter(
            bkey,
            d,
            hit.position,
            hit.normal,
            packet.mat_kind[hit.mat_id],
            packet.mat_albedo[hit.mat_id],
            packet.mat_param[hit.mat_id],
            config.shadow_eps,
            config.pdf_eps,
        )

        sky = materials.sky_attenuation(d, packet.sky_bottom, packet.sky_top)

        # factor for this bounce: scatter term on hit, sky on miss
        # the cos/pdf ratio is analytically constant — detached value is
        # its exact gradient AND the dominant remat-noise fix (gradsafe)
        hit_factor = gradsafe.cosine_ratio(
            srec.cos_weight, srec.pdf)[:, None] * srec.attenuation
        factor = jnp.where(hit.hit[:, None], hit_factor, sky)
        color = color * jnp.where(active[:, None], factor, 1.0)

        terminated = ~hit.hit | srec.terminated
        next_active = active & ~terminated
        o = jnp.where(next_active[:, None], srec.next_origin, o)
        d = jnp.where(next_active[:, None], srec.next_dir, d)
        return (o, d, color, next_active), None

    if config.remat_bounces:
        # Backward-pass memory: without remat the scan saves every per-bounce
        # intermediate (hit records, ONB, scatter dirs — ~20 (R, 3) arrays x
        # max_depth), which OOMs a 16 GB chip at 1080p. Checkpointing the body
        # keeps only the (o, d, color, active) carry per bounce and recomputes
        # the rest during backward — the "re-intersect instead of storing
        # hits" strategy (SURVEY §7), at ~2x bounce FLOPs.
        bounce = jax.checkpoint(bounce, policy=gradsafe.remat_policy)

    R = origins.shape[0]
    init = (
        origins,
        directions,
        jnp.ones((R, 3), jnp.float32),
        jnp.ones((R,), bool),
    )
    (_, _, color, _), _ = jax.lax.scan(
        bounce, init, jnp.arange(config.max_depth), length=config.max_depth
    )
    return color


def postprocess_sample(color, clamp: bool = True):
    """Per-sample clamp to [0,1] + non-finite scrub (`path_tracer.cu:345-353`).

    The reference clamps BEFORE accumulation (biasing bright emissive paths —
    preserved for parity) and then scrubs NaNs; its scrub ran after the
    accumulation add and was therefore ineffective — here the scrub is applied
    effectively (a conscious fix; with finite math NaNs should not occur).

    The scrub zeroes every non-finite value in BOTH modes: in the unbiased
    (``clamp=False``) HDR mode an ``inf`` sample must not enter the running
    average — ``nan_to_num``'s default would substitute float32-max (3.4e38),
    a finite-but-absurd value that silently poisons the accumulator forever.
    Dropping the sample (zero) keeps the estimator usable; with finite math
    the branch never fires.
    """
    if clamp:
        color = jnp.clip(color, 0.0, 1.0)
    return jnp.nan_to_num(color, nan=0.0, posinf=0.0, neginf=0.0)
