"""SoA ([3, N] / [9, N]) vs AoS ([N, 3] / [N, 3, 3]) layouts for the BA
matvec primitives: [N, 3] wastes 125/128 lanes on TPU (the no-op scale of
[80k, 3] measured 621 us — 42x the bandwidth bound)."""

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

N, K, L = 80_000, 10_000, 5_000
R = 50
rng = np.random.default_rng(0)
obs_kf = jnp.asarray(np.sort(rng.integers(0, K, N)).astype(np.int32))
obs_lm = jnp.asarray(rng.integers(0, L, N).astype(np.int32))
v3 = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32))
m9 = jnp.asarray(rng.normal(size=(9, N)).astype(np.float32))
vK3 = jnp.asarray(rng.normal(size=(3, K)).astype(np.float32))
vL3 = jnp.asarray(rng.normal(size=(3, L)).astype(np.float32))

from aruco_slam_tpu.models import ba

kf_rows = jnp.asarray(ba._rows_table(np.asarray(obs_kf), K, N))


def timeit(name, body, reps=5):
    def step(c, _):
        out = body(c)
        return jnp.sum(out) * 1e-12 + c * 0.5, None

    f = jax.jit(lambda c0: jax.lax.scan(step, c0, None, length=R)[0])
    out = f(jnp.float32(1.0))
    np.asarray(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(jnp.float32(1.0))
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1e6/R:9.1f} us/op", flush=True)


def matvec_soa(c):
    v = v3 * c
    return jnp.stack(
        [
            m9[0] * v[0] + m9[1] * v[1] + m9[2] * v[2],
            m9[3] * v[0] + m9[4] * v[1] + m9[5] * v[2],
            m9[6] * v[0] + m9[7] * v[1] + m9[8] * v[2],
        ]
    )


timeit("noop scale [3,N]", lambda c: v3 * c)
timeit("noop scale [9,N]", lambda c: m9 * c)
timeit("3x3 matvec SoA [9,N]x[3,N]", matvec_soa)
timeit("gather lanes vK3[:, obs_kf]", lambda c: (vK3 * c)[:, obs_kf])
timeit("gather lanes vL3[:, obs_lm]", lambda c: (vL3 * c)[:, obs_lm])
timeit("take axis1 vK3 obs_kf", lambda c: jnp.take(vK3 * c, obs_kf, axis=1))
timeit("scatter lanes at[:, obs_lm].add", lambda c: jnp.zeros((3, L), jnp.float32).at[:, obs_lm].add(v3 * c))
timeit("segsum on transposed ([N,3] round trip)", lambda c: jax.ops.segment_sum((v3 * c).T, obs_lm, num_segments=L).T)
timeit("table-sum SoA [3,N+1][:,rows] sum", lambda c: jnp.sum(jnp.pad(v3 * c, ((0, 0), (0, 1)))[:, kf_rows], axis=-1))
timeit("dense resh sum [3,K,8] -> [3,K]", lambda c: jnp.sum((v3 * c).reshape(3, K, 8), axis=-1))
