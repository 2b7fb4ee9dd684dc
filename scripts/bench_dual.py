"""dual_train_step at 1080p-shape on the chip (VERDICT r3 #2 done-cond)."""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from ptre_tpu.models import demo
from ptre_tpu.ops import camera as cam_ops, rng
from ptre_tpu.parallel import sharding as sh
from ptre_tpu.utils.config import RasterConfig, RenderConfig

W, H = 1920, 1080
scn = demo.reference_demo_scene(32, 16)
pkt = scn.build_packet()
rpkt = scn.build_packet(spheres_as_triangles=True)
cam = cam_ops.Camera.create(width=W, height=H)
cfg = RenderConfig(width=W, height=H)
rcfg = RasterConfig(width=W, height=H, supersample=2)
mesh = sh.make_mesh((1, 1), devices=jax.devices()[:1])
params = sh.differentiable_params(pkt, cam)
target = sh.to_shard_order(jnp.zeros((H, W, 3), jnp.float32), 1)
key = rng.key_for(0)
step = sh.make_dual_train_step(mesh, cam, cfg, rcfg, spp=1)
t0 = time.perf_counter()
loss, grads = step(params, pkt, rpkt, target, key)
ok = all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
print(f"compile+first step {time.perf_counter()-t0:.0f}s, finite={ok}")
for i in range(2):
    loss, grads = step(params, pkt, rpkt, target, rng.fold(key, 90+i))
jax.block_until_ready(jax.tree.leaves(grads)[0])
t0 = time.perf_counter(); n = 5
for i in range(n):
    loss, grads = step(params, pkt, rpkt, target, rng.fold(key, i))
jax.block_until_ready(jax.tree.leaves(grads)[0])
ms = (time.perf_counter()-t0)/n*1e3
import json
print(json.dumps({"metric": "dual_train_step_1080p_ms", "value": round(ms, 1),
                  "unit": "ms/step", "loss": float(loss)}))
