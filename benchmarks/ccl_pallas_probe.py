import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax, jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from aruco_slam_tpu.ops import detector
from aruco_slam_tpu.ops.kernels import ccl

rng = np.random.default_rng(0)
B = 8
fg = jnp.asarray(rng.random((B, 480, 640)) > 0.7)
jax.block_until_ready(fg)

f_pallas = jax.jit(jax.vmap(lambda m: ccl.label_components_tpu(m, 8)))
f_xla = jax.jit(jax.vmap(lambda m: detector.label_components(m, 8)))
t0 = time.time(); outp = f_pallas(fg); jax.block_until_ready(outp)
print("pallas compile+run", time.time() - t0, flush=True)
t0 = time.time(); outx = f_xla(fg); jax.block_until_ready(outx)
print("xla compile+run", time.time() - t0, flush=True)
print("bit-identical:", bool(jnp.array_equal(outp, outx)), flush=True)

def timeit(fn, reps=5):
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(fn(fg))
    return (time.time() - t0) / reps

print(f"pallas: {1e3*timeit(f_pallas)/B:.3f} ms/frame", flush=True)
print(f"xla   : {1e3*timeit(f_xla)/B:.3f} ms/frame", flush=True)
# in-program x10 to remove dispatch RTT
f_p10 = jax.jit(jax.vmap(lambda m: jax.lax.fori_loop(
    0, 10, lambda _, l: jnp.minimum(l, ccl.label_components_tpu(m, 8)), jnp.zeros(480*640, jnp.int32) + 10**9)))
jax.block_until_ready(f_p10(fg))
print(f"pallas x10 in-program: {1e3*timeit(f_p10)/(B*10):.3f} ms/frame", flush=True)
