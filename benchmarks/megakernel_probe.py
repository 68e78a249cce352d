"""Fused threshold+CCL megakernel vs separate stages, compiled on TPU."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aruco_slam_tpu.ops import detector as det
from aruco_slam_tpu.ops.kernels import ccl
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import synthetic

CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
CFG = det.DetectorConfig()
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    seq = synthetic.generate_sequence(
        synthetic.SimParams(duration=2.0, seed=0), level="images", camera=CAM)
imgs = jnp.asarray(np.asarray(seq.images))
B = imgs.shape[0]

def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {best*1e3/B:8.2f} ms/frame", flush=True)
    return out

f_sep = jax.jit(jax.vmap(lambda im: det.label_components(
    det.adaptive_threshold(im, CFG.adaptive_radius, CFG.adaptive_C, CFG.mean_stride),
    CFG.ccl_rounds)))
timeit("separate thr+ccl (XLA)", f_sep, imgs)
f_ccl_only = jax.jit(jax.vmap(lambda im: ccl.label_components_tpu(
    det.adaptive_threshold(im, CFG.adaptive_radius, CFG.adaptive_C, CFG.mean_stride),
    CFG.ccl_rounds)))
timeit("XLA thr + pallas ccl", f_ccl_only, imgs)
f_fused = jax.jit(jax.vmap(lambda im: ccl.threshold_label_tpu(
    im, CFG.adaptive_radius, CFG.adaptive_C, CFG.mean_stride, CFG.ccl_rounds)))
out = timeit("fused megakernel", f_fused, imgs)

# correctness compiled
fg_k, lab_k = out
ref = f_ccl_only(imgs)
fg_x = jax.jit(jax.vmap(lambda im: det.adaptive_threshold(
    im, CFG.adaptive_radius, CFG.adaptive_C, CFG.mean_stride)))(imgs)
print("fg equal:", bool(jnp.array_equal(fg_k, fg_x)),
      "labels equal:", bool(jnp.array_equal(lab_k, ref)), flush=True)

# full detector before/after (dispatch picks fused automatically on TPU)
f_all = jax.jit(jax.vmap(lambda im: det.detect_markers(im, CFG)))
timeit("full detector (fused dispatch)", f_all, imgs)
