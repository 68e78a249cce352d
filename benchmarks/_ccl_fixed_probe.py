"""Locate the fixed ~0.9 ms/frame in the threshold+CCL megakernel."""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aruco_slam_tpu.ops.kernels import ccl as K
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import synthetic

B = 20
CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    seq = synthetic.generate_sequence(
        synthetic.SimParams(duration=2.0, seed=0), level="images", camera=CAM
    )
imgs = jnp.asarray(np.asarray(seq.images)[:B]).astype(jnp.float32)
jax.block_until_ready(imgs)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


H, W = 480, 640


def thr_only_kernel(img_ref, fg_out, *, radius, C, stride, h, w):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    x = img_ref[:].astype(jnp.float32)
    fgm = K._fg_from_image(x, radius, C, stride, row_ids, col_ids, h, w)
    fg_out[:] = fgm.astype(jnp.int32)


@jax.jit
def thr_only(img):
    return pl.pallas_call(
        functools.partial(thr_only_kernel, radius=7, C=7.0, stride=4, h=H, w=W),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(img)


def copy_kernel(img_ref, out_ref):
    out_ref[:] = img_ref[:].astype(jnp.int32)


@jax.jit
def copy_only(img):
    return pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(img)


t = timeit(jax.vmap(copy_only), imgs)
print(f"copy-only kernel : {1e3*t/B:7.3f} ms/frame", flush=True)
t = timeit(jax.vmap(thr_only), imgs)
print(f"threshold-only   : {1e3*t/B:7.3f} ms/frame", flush=True)

for rounds in (0, 1, 2, 4, 8):
    fn = jax.jit(
        jax.vmap(lambda im: K.threshold_label_tpu(im, 7, 7.0, 4, rounds)[1])
    ) if rounds else jax.jit(jax.vmap(lambda im: thr_only(im)))
    t = timeit(fn, imgs)
    print(f"thr+ccl rounds {rounds}: {1e3*t/B:7.3f} ms/frame", flush=True)

# CCL alone from precomputed fg
from aruco_slam_tpu.ops import detector as det

fg = jax.jit(jax.vmap(lambda im: det.adaptive_threshold(im, 7, 7.0, 4)))(imgs)
jax.block_until_ready(fg)
for rounds in (1, 4, 8):
    fn = jax.jit(jax.vmap(lambda f: K.label_components_tpu(f, rounds)))
    t = timeit(fn, fg)
    print(f"ccl-only rounds {rounds}: {1e3*t/B:7.3f} ms/frame", flush=True)
