"""Per-stage detector timing at batch 8 on the real chip.

Separates adaptive threshold / CCL / quad extraction / decode / subpix so
the Pallas effort (VERDICT round-2 item 1) targets the real bottleneck.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aruco_slam_tpu.ops import detector as det
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import synthetic

CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
CFG = det.DetectorConfig()
B = int(os.environ.get("PROBE_B", "32"))

cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    seq = synthetic.generate_sequence(
        synthetic.SimParams(duration=2.0, seed=0), level="images", camera=CAM
    )
imgs = jnp.asarray(np.asarray(seq.images)[:B])
jax.block_until_ready(imgs)
print("imgs", imgs.shape, file=sys.stderr)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # true first-exec barrier (axon)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


f_thr = jax.jit(jax.vmap(lambda im: det.adaptive_threshold(im, CFG.adaptive_radius, CFG.adaptive_C)))
t, _ = timeit(f_thr, imgs)
print(f"threshold exact : {1e3*t/B:8.2f} ms/frame", flush=True)
f_thr2 = jax.jit(jax.vmap(lambda im: det.adaptive_threshold(
    im, CFG.adaptive_radius, CFG.adaptive_C, CFG.mean_stride)))
t, fg = timeit(f_thr2, imgs)
print(f"threshold s{CFG.mean_stride}    : {1e3*t/B:8.2f} ms/frame", flush=True)

f_ccl = jax.jit(jax.vmap(lambda m: det.label_components(m, CFG.ccl_rounds)))
t, labels = timeit(f_ccl, fg)
print(f"ccl xla   : {1e3*t/B:8.2f} ms/frame", flush=True)

if jax.default_backend() == "tpu":
    from aruco_slam_tpu.ops.kernels import ccl as ccl_kernel

    f_cclp = jax.jit(
        jax.vmap(lambda m: ccl_kernel.label_components_tpu(m, CFG.ccl_rounds))
    )
    t, labels = timeit(f_cclp, fg)
    print(f"ccl pallas: {1e3*t/B:8.2f} ms/frame", flush=True)

f_quad = jax.jit(jax.vmap(lambda l, m: det.extract_quads(l, m, CFG)))
t, (corners, cand_valid) = timeit(f_quad, labels, fg)
print(f"quads     : {1e3*t/B:8.2f} ms/frame", flush=True)

f_dec = jax.jit(jax.vmap(lambda im, c: det.decode_candidates(im, c, CFG)))
t, _ = timeit(f_dec, imgs, corners)
print(f"decode    : {1e3*t/B:8.2f} ms/frame", flush=True)

f_sub = jax.jit(jax.vmap(lambda im, c: det.refine_corners_subpix(
    im, c, CFG.subpix_window, CFG.subpix_iters)))
t, _ = timeit(f_sub, imgs, corners)
print(f"subpix    : {1e3*t/B:8.2f} ms/frame", flush=True)

f_all = jax.jit(jax.vmap(lambda im: det.detect_markers(im, CFG)))
t, _ = timeit(f_all, imgs)
print(f"full      : {1e3*t/B:8.2f} ms/frame", flush=True)
