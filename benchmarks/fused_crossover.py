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
REPS = 30


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


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # true first-exec barrier (axon)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


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
            "scan": jax.jit(lambda s, f: ekf.update(s, f, cfg)),
            "fused": jax.jit(lambda s, f: ekf.update_fused(s, f, cfg)),
        }
        if on_tpu:
            from aruco_slam_tpu.ops.kernels import ekf_update as kern

            legs["pallas"] = jax.jit(lambda s, f: kern.frame_update(s, f, cfg))
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
