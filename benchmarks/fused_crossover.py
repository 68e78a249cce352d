"""update_fused crossover study (VERDICT round 2 item 6 / round 1 task 5).

`ekf.update_fused` (exact block-LDL frame update) lost to the sequential
scan at max_landmarks=32/99 (docs/PERFORMANCE.md item 7) and survived on
the speculation that the crossover "should arrive at much larger maps".
This measures it where that claim lives: batch 1, max_landmarks in
{32, 128, 256, 512}, frame of 8 observations, against the XLA scan and
the Pallas streaming kernel. Keep it only if it wins somewhere reachable.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from aruco_slam_tpu.models import ekf
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

M_OBS = 8
REPS = 8


def make_state(cfg, key):
    """A filter state with a full map (worst case for the update cost)."""
    n_lm = cfg.ekf.max_landmarks
    n = 3 + 3 * n_lm
    k1, k2 = jax.random.split(key)
    state = ekf.init_state(cfg)
    mu = jax.random.normal(k1, (n,)) * 0.5
    a = jax.random.normal(k2, (n, n)) * 0.01
    sigma = a @ a.T + jnp.eye(n) * 0.05
    slot_ids = jnp.arange(n_lm, dtype=jnp.int32)
    return state._replace(
        mu=mu,
        sigma=sigma,
        slot_ids=slot_ids,
        n_landmarks=jnp.int32(n_lm),
        initialized=jnp.asarray(True),
    )


def make_frame(cfg, key):
    ids = jnp.arange(M_OBS, dtype=jnp.int32) * 3  # known landmarks
    z = jax.random.normal(key, (M_OBS, 3)) * 0.1 + jnp.asarray([1.0, 0.0, 0.0])
    R = jnp.broadcast_to(jnp.eye(3) * 0.01, (M_OBS, 3, 3))
    valid = jnp.ones((M_OBS,), bool)
    return ekf.FrameObservations(ids=ids, z=z, R=R, valid=valid)


def chained(update_fn, k):
    """jit(state, frame -> state after k sequential frame updates): the
    state carry chains the iterations, so XLA cannot CSE them and the
    per-update cost is (t(k2) - t(k1)) / (k2 - k1) — immune to the
    remote-TPU tunnel's per-dispatch latency (up to ~32 ms when the
    tunnel degrades, which would swamp any per-call timing here)."""

    @jax.jit
    def run(state, frame):
        def body(s, _):
            return update_fn(s, frame), None

        s, _ = jax.lax.scan(body, state, None, length=k)
        return s.mu[:3]

    return run


def timeit(update_fn, state, frame, k1=8, k2=56):
    f1, f2 = chained(update_fn, k1), chained(update_fn, k2)
    np.asarray(f1(state, frame))
    np.asarray(f2(state, frame))  # true first-exec barriers (axon)
    t1 = t2 = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(f1(state, frame))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(f2(state, frame))
        t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (k2 - k1)


def main():
    on_tpu = jax.default_backend() == "tpu"
    rows = []
    for n_lm in (32, 128, 256, 512):
        cfg = SlamConfig(
            ekf=EkfConfig(max_landmarks=n_lm, max_observations_per_frame=M_OBS)
        )
        key = jax.random.PRNGKey(0)
        state = make_state(cfg, key)
        frame = make_frame(cfg, jax.random.PRNGKey(1))

        legs = {
            "scan": lambda s, f: ekf.update(s, f, cfg),
            "fused": lambda s, f: ekf.update_fused(s, f, cfg),
        }
        if on_tpu:
            from aruco_slam_tpu.ops.kernels import ekf_update as kern

            legs["pallas"] = lambda s, f: kern.frame_update(s, f, cfg)
        row = {"max_landmarks": n_lm}
        for name, fn in legs.items():
            try:
                row[name + "_us"] = round(1e6 * timeit(fn, state, frame), 1)
            except Exception as e:
                row[name + "_us"] = f"{type(e).__name__}"
        rows.append(row)
        print(row, flush=True)
    import json

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
