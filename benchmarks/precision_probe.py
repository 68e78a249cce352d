"""Upper bound for a mixed-precision pass: corner-level batched replay at
matmul precision 'default' (1 bf16 MXU pass) vs 'highest' (true f32, the
shipped setting — the EKF covariance recursion NaNs without it).

Run twice: PROBE_PREC=default / PROBE_PREC=highest (cache dirs are
separate — the compilation-cache key ignores the precision config,
CLAUDE.md gotcha)."""

import os
import sys
import time

prec = os.environ.get("PROBE_PREC", "default")
os.environ["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/aruco_prec_cache_{prec}"

import jax

jax.config.update("jax_default_matmul_precision", prec)
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from aruco_slam_tpu import runner
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import synthetic
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

cfg = SlamConfig(ekf=EkfConfig(max_landmarks=32, max_observations_per_frame=16))
cam = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
seqs = [
    synthetic.generate_sequence(
        synthetic.SimParams(duration=60.0, seed=s), level="corners", camera=cam
    )
    for s in range(8)
]
data = runner.build_batch_data(seqs, 64, "corners")
out = runner.replay_batch(data, cfg, cam, "corners")
np.asarray(out.trajectory)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    out = runner.replay_batch(data, cfg, cam, "corners")
    jax.block_until_ready(out.trajectory)
    best = min(best, time.perf_counter() - t0)
batch, frames = data.obs_ids.shape[:2]
traj = np.asarray(out.trajectory)
res = runner.evaluate_sequence(
    seqs[0], cfg, camera=cam, level="corners",
)
print(
    f"precision={prec}: {batch*frames/best:9.1f} fps  "
    f"nan={np.isnan(traj).any()}  ate_seq0={res['ate']:.5f}",
    flush=True,
)
