"""Multi-host (multi-process) tests: real `jax.distributed` jobs on localhost.

The parent (this pytest process, 8 virtual single-process devices) computes
the expected sharded render/train results; then N processes with 4 virtual
devices each are spawned, joined via `jax.distributed.initialize`, and must
reproduce them shard-for-shard — the SURVEY §4 "multi-host tests driven on
CPU via jax.distributed" prescription backing the ≥85% multi-host north star.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from ptre_tpu.models import demo
from ptre_tpu.ops import camera as cam_ops, rng
from ptre_tpu.parallel import sharding as sh
from ptre_tpu.render import pathtracer as pt
from ptre_tpu.utils.config import RenderConfig

# slow tier: real 2-process jax.distributed runs (~minutes on a shared host)
pytestmark = pytest.mark.slow

H = W = 16
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _expected(dp: int, sp: int, path: str):
    """Single-process expectation for mesh (dp, sp) — the shard math depends
    only on mesh coordinates, so it matches the multi-process run exactly."""
    scn = demo.reference_demo_scene(8, 4)
    pkt = scn.build_packet()
    cam = cam_ops.Camera.create(width=W, height=H)
    cfg = RenderConfig(width=W, height=H)
    key = rng.key_for(7)
    mesh = sh.make_mesh((dp, sp))

    accum = pt.AccumState.create(H, W)
    out = sh.shard_render_step(mesh, pkt, cam, accum, key, cfg, spp=2)

    params = sh.differentiable_params(pkt, cam)
    target = np.zeros((H, W, 3), np.float32)
    loss, grads, _ = sh.shard_train_step(
        mesh, params, pkt, cam, target, key, cfg, spp=2
    )
    np.savez(
        path, dp=dp, sp=sp, linear=np.asarray(out.linear),
        loss=np.asarray(loss),
        grad_sph_radius=np.asarray(grads["sph_radius"]),
        grad_mat_albedo=np.asarray(grads["mat_albedo"]),
        grad_cam_fov=np.asarray(grads["cam_fov"]),
    )


@pytest.mark.parametrize("dp,sp", [(8, 1), (4, 2)])
def test_multiprocess_matches_single_process(tmp_path, dp, sp):
    expected = str(tmp_path / "expected.npz")
    _expected(dp, sp, expected)

    nproc = 2
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_ROOT, "tests", "_mp_worker.py"),
             str(pid), str(nproc), str(port), expected],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=_ROOT,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out
