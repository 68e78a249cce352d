"""Round-3 verify: image-level pipeline e2e on TPU with the scatter-free
bbox detector + ccl vmem fix (uncommitted working tree)."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
import numpy as np
from aruco_slam_tpu import runner
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import synthetic
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
cfg = SlamConfig(ekf=EkfConfig(max_landmarks=32, max_observations_per_frame=24))
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    seq = synthetic.generate_sequence(
        synthetic.SimParams(duration=10.0, seed=3), level="images", camera=CAM)
res = runner.evaluate_sequence(seq, cfg, camera=CAM, level="images")
print({k: (round(float(v), 5) if np.isscalar(v) or getattr(v, "ndim", 1) == 0 else v)
       for k, v in res.items() if k in ("ate", "rpe", "map_rmse", "matched")})
