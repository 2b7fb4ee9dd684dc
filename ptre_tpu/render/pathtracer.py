"""Progressive path-tracer frame pipeline.

TPU-native equivalent of the reference path tracer engine
(`IoniqRE/path_tracer.{h,cu}`): the 0.1 s sync → D2H copy → packet rebuild →
kernel relaunch dance (`path_tracer.cu:368-404`) becomes a single jit-compiled
`render_step` that takes the HBM-resident ScenePacket + accumulation state and
returns the updated state — the host touches pixels only to write files.
Buffer donation gives in-place accumulation; dispatch-ahead replaces the
reference's async-kernel overlap.

Accumulation reproduces `render_kernel` (`path_tracer.cu:330-366`) exactly:
one sample per pixel per "launch", per-sample clamp to [0,1], running average
lin = c/n + lin*(n-1)/n, and sqrt display gamma with truncating uint8 cast.
Reset keeps the reference's trick of only zeroing the sample counter — the
n = 1 running-average step overwrites history (`path_tracer.cu:394-400`).
"""

from __future__ import annotations

import functools

from flax import struct
import jax
import jax.numpy as jnp

from ptre_tpu.ops import camera as cam_ops
from ptre_tpu.ops import integrator, rng
from ptre_tpu.utils.config import RenderConfig
from ptre_tpu.utils.backend import is_tpu_backend


@struct.dataclass
class AccumState:
    """Progressive accumulation state (reference `path_tracer.h:61-62`)."""

    linear: jnp.ndarray  # (H, W, 3) float32 running-average linear color
    frame: jnp.ndarray  # () int32 — samples accumulated so far (m_crt_frame)

    @classmethod
    def create(cls, height: int, width: int) -> "AccumState":
        return cls(
            linear=jnp.zeros((height, width, 3), jnp.float32),
            frame=jnp.zeros((), jnp.int32),
        )

    def reset(self) -> "AccumState":
        """Restart accumulation by zeroing the counter (`path_tracer.cu:394-400`);
        the linear buffer is overwritten at n=1 by the running average."""
        return self.replace(frame=jnp.zeros((), jnp.int32))


def pixel_grid(height: int, width: int):
    """Flattened pixel coordinates: x right, y down (pixelid = y*W + x)."""
    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    return px.reshape(-1), py.reshape(-1)


def _resolve_pipeline(config: RenderConfig) -> str:
    """"fused" (single megakernel dispatch) vs "staged" (sweep kernel + XLA
    shading). auto → fused on TPU: it is the production path; the staged
    path remains the differentiable/training and CPU-reference path."""
    b = config.intersect_backend
    if b == "fused":
        return "fused"
    if b == "auto" and is_tpu_backend():
        return "fused"
    return "staged"


def sample_image(key, packet, cam, config: RenderConfig, ray_chunk: int = 0):
    """One jittered sample per pixel → clamped linear color (H*W, 3).

    ``ray_chunk`` > 0 traces pixels in chunks of that size via `lax.map` to
    bound the (rays × primitives) intermediate; 0 traces all rays at once.
    """
    px, py = pixel_grid(cam.height, cam.width)
    jitter = rng.pixel_jitter(rng.fold(key, 0x9E37), (px.shape[0],))
    origins, dirs = cam_ops.get_rays(cam, px, py, jitter)

    if _resolve_pipeline(config) == "fused":
        from ptre_tpu.ops.pallas import megakernel, wavefront

        if megakernel.dense_supported(packet):
            seed = jax.random.randint(rng.fold(key, 0x5EED), (), 0, 2**31 - 1)
            color = megakernel.trace_fused(seed, origins, dirs, packet, config)
            return integrator.postprocess_sample(color, config.clamp_samples)
        if wavefront.supports(packet):
            # triangle-scale scenes: the sorted wavefront path — ties the
            # culled megakernel on shallow scenes, 2.4x faster on deep-path
            # (diffuse-mesh) scenes, and takes ~50% more triangles before
            # the VMEM ceiling (docs/PERF.md round-4)
            color = wavefront.trace(rng.fold(key, 0x5EED), origins, dirs,
                                    packet, config,
                                    tile_hint=(cam.height, cam.width),
                                    screen_cam=cam)
            return integrator.postprocess_sample(color, config.clamp_samples)
        # unsupported packet (e.g. >8 materials or too many primitive
        # tiles): fall back to the staged pipeline rather than crash

    if ray_chunk and px.shape[0] > ray_chunk:
        n = px.shape[0]
        assert n % ray_chunk == 0, (n, ray_chunk)
        chunks = n // ray_chunk
        o = origins.reshape(chunks, ray_chunk, 3)
        d = dirs.reshape(chunks, ray_chunk, 3)
        ids = jnp.arange(chunks)

        def one(args):
            cid, oc, dc = args
            return integrator.trace(rng.fold(key, cid), oc, dc, packet, config)

        color = jax.lax.map(one, (ids, o, d)).reshape(n, 3)
    else:
        color = integrator.trace(key, origins, dirs, packet, config,
                                 screen_cam=cam)

    return integrator.postprocess_sample(color, config.clamp_samples)


def render_step(packet, cam, accum: AccumState, key, config: RenderConfig,
                spp: int = 1, ray_chunk: int = 0) -> AccumState:
    """Accumulate ``spp`` progressive samples into the running average.

    Each sample replays the reference's per-launch update with n = frame+1
    (`path_tracer.cu:356-358`, counter increment at `path_tracer.cu:401`).
    """

    if _resolve_pipeline(config) == "fused":
        from ptre_tpu.ops.pallas import render_kernel

        if render_kernel.supports(cam, packet, config):
            # whole-sample fused path: ray gen + bounce loop + accumulate in
            # one dispatch per sample over the planar (3, H, W) accumulator
            lin_p = jnp.transpose(accum.linear, (2, 0, 1))
            for s in range(spp):
                n1 = accum.frame + (s + 1)
                skey = rng.fold(rng.fold(key, s), s + 1)
                seed = jax.random.randint(skey, (), 0, 2**31 - 1)
                lin_p = render_kernel.sample_accum_fused(
                    seed, packet, cam, lin_p, n1.astype(jnp.float32), config
                )
            return AccumState(
                linear=jnp.transpose(lin_p, (1, 2, 0)),
                frame=accum.frame + spp,
            )

    def body(carry, s):
        lin, n = carry
        n1 = n + 1
        skey = rng.fold(rng.fold(key, s), n1)
        img = sample_image(skey, packet, cam, config, ray_chunk)
        img = img.reshape(cam.height, cam.width, 3)
        n1f = n1.astype(jnp.float32)
        lin = img / n1f + lin * ((n1f - 1.0) / n1f)
        return (lin, n1), None

    (linear, frame), _ = jax.lax.scan(
        body, (accum.linear, accum.frame), jnp.arange(spp)
    )
    return AccumState(linear=linear, frame=frame)


@functools.partial(jax.jit, static_argnames=("config", "spp", "ray_chunk"),
                   donate_argnames=("accum",))
def render_step_jit(packet, cam, accum, key, config, spp=1, ray_chunk=0):
    """Jitted render_step with accumulation-buffer donation (in-place update)."""
    return render_step(packet, cam, accum, key, config, spp, ray_chunk)


def to_display(linear, sqrt_gamma: bool = True):
    """Linear → display uint8 RGB: sqrt gamma, ×255, truncating cast
    (`path_tracer.cu:360-365`)."""
    img = jnp.sqrt(jnp.maximum(linear, 0.0)) if sqrt_gamma else linear
    return (255.0 * jnp.clip(img, 0.0, 1.0)).astype(jnp.uint8)


def to_bgra8(rgb_u8):
    """RGB uint8 → BGRA8 bytes, the reference framebuffer format
    (`path_tracer.h:15-21`, BGRA swap-chain `renderer_base.cu:44`)."""
    b = rgb_u8[..., 2:3]
    g = rgb_u8[..., 1:2]
    r = rgb_u8[..., 0:1]
    a = jnp.full_like(r, 255)
    return jnp.concatenate([b, g, r, a], axis=-1)
