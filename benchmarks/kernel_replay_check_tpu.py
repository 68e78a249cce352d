"""Compiled-on-TPU check: kernel-driven batched replay (PnP + EKF kernels)
vs the vmapped XLA replay on real sequences."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from aruco_slam_tpu import runner
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import synthetic
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

cam = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
cfg = SlamConfig(ekf=EkfConfig(max_landmarks=32, max_observations_per_frame=16))
seqs = [synthetic.generate_sequence(synthetic.SimParams(duration=20.0, seed=s),
                                    level="corners", camera=cam) for s in range(4)]
data = runner.build_batch_data(seqs, 8, "corners")
ref = runner._replay_batch_jit(data, cfg, cam, "corners")
out = runner._replay_batch_kernel(data, cfg, cam, "corners", pnp_kernel=True)
t0, t1 = np.asarray(ref.trajectory), np.asarray(out.trajectory)
print("traj max abs diff:", np.abs(t0 - t1).max())
print("n_lm equal:", np.array_equal(np.asarray(ref.n_landmarks), np.asarray(out.n_landmarks)))
res_ref = runner.evaluate_sequence(seqs[0], cfg, camera=cam, level="corners")
print("single-stream ATE (sanity):", res_ref["ate"])
