import os, sys, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
import numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from aruco_slam_tpu.ops.kernels import ccl

rng = np.random.default_rng(0)
h, w = 1080, 1920
img = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8))
for lim_mb in (100, 112):
    try:
        out = pl.pallas_call(
            functools.partial(ccl._threshold_ccl_kernel, rounds=3, h=h, w=w,
                              radius=7, C=7.0, stride=4),
            out_shape=(jax.ShapeDtypeStruct((h, w), jnp.int32),
                       jax.ShapeDtypeStruct((h, w), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=lim_mb * 2**20),
        )(img.astype(jnp.float32))
        jax.block_until_ready(out[1]); np.asarray(out[1][:1, :4])
        print(f"limit {lim_mb}MB: OK", flush=True)
        break
    except Exception as e:
        s = str(e)
        key = [l for l in s.splitlines() if "exceed" in l or "Mosaic" in l or "alloc" in l]
        print(f"limit {lim_mb}MB: FAIL", key[:3] if key else s[:400], flush=True)
