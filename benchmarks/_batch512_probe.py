"""Probe: corner-level replay throughput at batch 384/512 (3-4 full
128-lane tiles) vs the shipped 256. The committed sweep
(batch_size_sweep.py) stopped at 256; larger batches amortize the
per-dispatch tunnel cost over more frames and may tile just as well.
Run from /root/repo."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

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
cam = seqs[0].camera()

for batch in (256, 384, 512):
    data = runner.build_batch_data(seqs, batch, "corners")
    out = runner.replay_batch(data, cfg, cam, "corners")
    np.asarray(out.trajectory)  # true first-exec barrier (gotcha 9)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = runner.replay_batch(data, cfg, cam, "corners")
        jax.block_until_ready(out.trajectory)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    frames = data.obs_ids.shape[1]
    print(
        f"batch {batch}: {batch * frames / ts[len(ts) // 2]:.1f} fps/chip "
        f"(reps {['%.3f' % t for t in ts]})",
        flush=True,
    )
