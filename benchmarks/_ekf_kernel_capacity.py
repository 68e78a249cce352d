"""Capacity sweep for the single-stream Pallas EKF frame kernel: at what
max_landmarks does frame_update stop compiling/running on-chip? Drives the
size gate in runner.frame_update_for."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np

from aruco_slam_tpu.models import ekf
from aruco_slam_tpu.ops.kernels import ekf_update as kern
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig


def make(cfg, key):
    n_lm = cfg.ekf.max_landmarks
    n = 3 + 3 * n_lm
    k1, k2, k3 = jax.random.split(key, 3)
    mu = jax.random.normal(k1, (n,)) * 0.1
    a = jax.random.normal(k2, (n, n)) * 0.01
    sigma = a @ a.T + jnp.eye(n) * 0.05
    state = ekf.EkfState(
        mu=mu, sigma=sigma,
        slot_ids=jnp.arange(n_lm, dtype=jnp.int32),
        n_landmarks=jnp.int32(n_lm),
        last_obs=jnp.zeros((n_lm, 3)),
        seen_prev=jnp.zeros((n_lm,), bool),
        initialized=jnp.int32(1),
        diverged=jnp.int32(0),
        dropped=jnp.int32(0),
    )
    m = cfg.ekf.max_observations_per_frame
    ids = jnp.arange(m, dtype=jnp.int32)
    z = jax.random.normal(k3, (m, 3)) * 0.1
    R = jnp.broadcast_to(jnp.eye(3) * 0.01, (m, 3, 3))
    frame = ekf.FrameObservations(ids=ids, z=z, R=R,
                                  valid=jnp.ones((m,), bool))
    return state, frame


for n_lm in (99, 128, 192, 256, 320, 512):
    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=n_lm,
                                   max_observations_per_frame=8))
    state, frame = make(cfg, jax.random.PRNGKey(0))
    n = 3 + 3 * n_lm
    mb = 2 * n * n * 4 / 2**20
    try:
        t0 = time.perf_counter()
        out = kern.frame_update(state, frame, cfg)
        np.asarray(out.mu[:3])
        dt = time.perf_counter() - t0
        # cross-check vs the XLA scan
        ref = ekf.update(state, frame, cfg)
        d = float(jnp.max(jnp.abs(out.mu - ref.mu)))
        print(f"max_lm={n_lm:4d} (sigma 2x{mb:6.1f} MB): OK "
              f"first-exec {dt:.1f}s, |mu diff| {d:.2e}", flush=True)
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"max_lm={n_lm:4d} (sigma 2x{mb:6.1f} MB): "
              f"{type(e).__name__}: {msg}", flush=True)
