import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
import numpy as np, jax.numpy as jnp
from aruco_slam_tpu.ops.kernels import ccl

rng = np.random.default_rng(0)
h, w = 1080, 1920
img = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8))
try:
    fg, lab = ccl.threshold_label_tpu(img, 7, 7.0, 4, 3)
    jax.block_until_ready(lab); np.asarray(lab[:4])
    print("single threshold_label_tpu 1080p OK", flush=True)
except Exception as e:
    print("single FAIL:", str(e)[:2000], flush=True)
fgm = jnp.asarray(rng.random((1080, 1920)) < 0.3)
try:
    lab2 = ccl.label_components_tpu(fgm, 2, init=jnp.zeros((h, w), jnp.int32) + jnp.arange(w, dtype=jnp.int32)[None, :])
    jax.block_until_ready(lab2); np.asarray(lab2[:4])
    print("seeded label_components_tpu 1080p OK", flush=True)
except Exception as e:
    print("seeded FAIL:", str(e)[:2000], flush=True)
