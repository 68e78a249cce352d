"""Single-stream (batch 1) EKF frame-step timing: XLA update vs the Pallas
VMEM-resident frame-update kernel, and batched (64) for the crossover.

The reference's own operating shape is ONE robot / one camera stream
(src/aruco_slam_node.cpp callbacks) — single-stream latency is the
deployment-relevant number; batch 64 is the replay-throughput shape.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aruco_slam_tpu.models import ekf
from aruco_slam_tpu.ops.kernels import ekf_update as kern
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

F = 200  # frames per timed program
M = 16  # obs slots per frame
EPF = 10


def make_frames(cfg, batch, seed=0):
    rng = np.random.default_rng(seed)
    m = cfg.ekf.max_observations_per_frame
    ids = rng.integers(0, 24, size=(batch, F, m)).astype(np.int32)
    z = rng.uniform(0.2, 2.5, size=(batch, F, m, 3)).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32) * 0.03, (batch, F, m, 1, 1))
    valid = rng.random((batch, F, m)) < 0.6
    enc_w = rng.uniform(0.5, 2.0, size=(batch, F, EPF, 2)).astype(np.float32)
    enc_dt = np.full((batch, F, EPF), 0.01, np.float32)
    return tuple(map(jnp.asarray, (ids, z, R, valid, enc_w, enc_dt)))


def replay_fn(cfg, backend):
    upd = {"xla": ekf.update, "pallas": kern.frame_update}[backend]

    def one_seq(ids, z, R, valid, enc_w, enc_dt):
        st = ekf.init_state(cfg)._replace(initialized=jnp.ones((), bool))

        def frame(st, xs):
            i, zz, rr, vv, ew, edt = xs
            st = ekf.predict_block(st, ekf.Control(ew[:, 0], ew[:, 1], edt), cfg)
            fr = ekf.FrameObservations(ids=i, z=zz, R=rr, valid=vv)
            st = upd(st, fr, cfg)
            return st, st.mu[:3]

        _, traj = jax.lax.scan(frame, st, (ids, z, R, valid, enc_w, enc_dt))
        return traj

    return jax.jit(jax.vmap(one_seq))


def time_it(fn, args, reps=5):
    out = fn(*args)
    np.asarray(out)  # true first-exec barrier on the remote-TPU backend
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=32, max_observations_per_frame=M))
    for batch in (1, 8, 64):
        args = make_frames(cfg, batch)
        for backend in ("xla", "pallas"):
            try:
                dt = time_it(replay_fn(cfg, backend), args)
                print(
                    f"batch={batch:3d} {backend:6s}: {dt*1e6/(batch*F):8.1f} us/frame"
                    f"  ({batch*F/dt:10.0f} fps)",
                    flush=True,
                )
            except Exception as e:
                print(f"batch={batch:3d} {backend:6s}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
