"""TPU timing: batched-lanes EKF frame kernel vs the XLA scan path at the
bench shape (batch 64, N=99, M=16). Timing inputs are precomputed
per-frame arrays; the kernel runs inside one lax.scan like the replay."""

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

from aruco_slam_tpu.models import ekf
from aruco_slam_tpu.ops.kernels import ekf_update_batched as kb
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

B = int(os.environ.get("PERF_B", "64"))
F = 200
M = 16
CFG = SlamConfig(ekf=EkfConfig(max_landmarks=32, max_observations_per_frame=M))
N = 3 + 3 * 32

rng = np.random.default_rng(0)
ids = rng.integers(0, 30, size=(F, M, B)).astype(np.int32)
z = rng.uniform(0.2, 2.5, size=(F, M, 3, B)).astype(np.float32)
R9 = np.tile(
    (np.eye(3, dtype=np.float32) * 0.03).reshape(9, 1), (F, M, 1, B)
).reshape(F, M, 9, B)
valid = (rng.random((F, M, B)) < 0.6).astype(np.int32)
slots = np.where(
    rng.random((F, M, B)) < 0.8, rng.integers(0, 30, (F, M, B)), -1
).astype(np.int32)
pose = rng.normal(size=(F, 3, B)).astype(np.float32)
A9 = np.tile(np.eye(3, dtype=np.float32).reshape(9, 1), (F, 1, B))
Q9 = np.tile((np.eye(3, dtype=np.float32) * 1e-5).reshape(9, 1), (F, 1, B))

xs = tuple(map(jnp.asarray, (pose, A9, Q9, ids, z, R9, valid, slots)))

state0 = dict(
    mu=jnp.zeros((N, B), jnp.float32),
    sigma=jnp.zeros((N, N, B), jnp.float32),
    slot_ids=jnp.tile(jnp.arange(32, dtype=jnp.int32)[:, None], (1, B)),
    n_lm=jnp.full((1, B), 30, jnp.int32),
    last_obs=jnp.zeros((32, 3, B), jnp.float32),
    seen=jnp.zeros((32, B), jnp.int32),
    div=jnp.zeros((1, B), jnp.int32),
    drop=jnp.zeros((1, B), jnp.int32),
)


def run_kernel(st):
    def step(s, x):
        p, a, q, i_, z_, r_, v_, sl_ = x
        s = kb.frame_step_batched(s, p, a, q, i_, z_, r_, v_, sl_, CFG)
        return s, s["mu"][:3]

    return jax.lax.scan(step, st, xs)


f = jax.jit(run_kernel)
t0 = time.time()
st, traj = f(state0)
np.asarray(traj)
print(f"compile+first: {time.time()-t0:.1f} s", flush=True)
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    st, traj = f(state0)
    jax.block_until_ready(traj)
    best = min(best, time.perf_counter() - t0)
print(f"kernel path: {best*1e6/F:8.1f} us/frame (all {B} lanes)", flush=True)
print("(XLA scan reference at this shape: ~1.2 ms/frame for 64 lanes — "
      "benchmarks/ekf_kernel_probe.py batch-64 row x64)", flush=True)
