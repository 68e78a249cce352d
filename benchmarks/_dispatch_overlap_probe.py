"""Do consecutive independent dispatches overlap on the axon backend, or
does each pay the full tunnel round trip?"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
x = jnp.ones((256, 256))
f = jax.jit(lambda v: (v @ v).sum())
out = f(x); np.asarray(out)
# one call
ts = []
for _ in range(5):
    t0 = time.perf_counter(); o = f(x); jax.block_until_ready(o); ts.append(time.perf_counter()-t0)
one = min(ts)
print(f"1 call : {1e3*one:.1f} ms")
# 10 independent calls, block at the end only
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    outs = [f(x + i) for i in range(10)]
    jax.block_until_ready(outs)
    ts.append(time.perf_counter()-t0)
ten = min(ts)
print(f"10 calls (block at end): {1e3*ten:.1f} ms -> {ten/one:.1f}x one call")
print("=> dispatches", "SERIALIZE (each pays the round trip)" if ten > 5*one else "overlap/pipeline")
