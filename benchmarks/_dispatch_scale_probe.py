"""Round-5: does detect_frames per-frame cost rise with the number of
chunks in flight? Same tunnel session, same chunk=16: F=160 vs F=640 vs
F=1920 (tiled frames)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp
from aruco_slam_tpu import runner
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.ops.detector import DetectorConfig
from aruco_slam_tpu.sim import synthetic

CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    seq = synthetic.generate_sequence(
        synthetic.SimParams(duration=13.0, seed=0), level="images", camera=CAM)
base = np.asarray(seq.images)[:128]
cfg = DetectorConfig()
for F in (128, 640, 1920):
    reps_needed = -(-F // 128)
    imgs = jnp.asarray(np.concatenate([base] * reps_needed)[:F])
    jax.block_until_ready(imgs)
    out = runner.detect_frames(imgs, cfg, 16)
    np.asarray(out[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = runner.detect_frames(imgs, cfg, 16)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"F={F}: {best/F*1e3:.3f} ms/frame ({F/best:.1f} fps)", flush=True)
