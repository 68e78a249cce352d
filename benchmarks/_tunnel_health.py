import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp, numpy as np
x = jnp.ones((8, 128))
f = jax.jit(lambda v: v + 1)
y = f(x); np.asarray(y)
ts = []
for _ in range(20):
    t0 = time.perf_counter(); y = f(y); jax.block_until_ready(y); ts.append(time.perf_counter() - t0)
print("null dispatch ms: min %.2f med %.2f max %.2f" % (1e3*min(ts), 1e3*sorted(ts)[10], 1e3*max(ts)))
