"""Scaling-efficiency measurement for the distributed BA backend
(BASELINE.md: >=80% frames/s scaling efficiency at N>=2 hosts; VERDICT
round 1 item 3 — "ship scaling-efficiency evidence").

Real multi-chip hardware is not available in this environment, so this
measures what CAN be measured here, explicitly labeled:

1. **Work balance** of ``dist_ba.partition_problem`` — the static property
   that determines scaling on real hardware (a shard that owns k times the
   observations runs k times longer between psums).
2. **Strong scaling** of ``dist_ba.solve_dist`` on an 8-way virtual CPU
   mesh (1 -> 8 devices, fixed problem). All virtual devices share one
   host's cores, so wall-clock speedup is NOT expected; what this measures
   is that per-device *work* shrinks ~1/N while the collective schedule
   stays fixed (the compiled program's cost model), plus the partitioning
   overhead XLA:CPU adds.
3. **2-process efficiency**: the multihost smoke solve (2 processes x 4
   devices, cross-process collectives over gRPC) timed against the same
   8-device solve in one process — the distributed-runtime overhead of
   crossing a process boundary with the identical program.

Writes a ``scaling`` section into benchmarks/results.json.
"""

import json
import os
import subprocess
import sys
import time

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

N_KF, N_LM, OBS_PER_KF = 2048, 1024, 8
ITERS, CG = 3, 40


def _solve_time(problem, n_dev, reps=3):
    from aruco_slam_tpu.parallel import dist_ba

    sharded, _ = dist_ba.partition_problem(problem, n_dev)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), (dist_ba.AXIS,))
    run = lambda: dist_ba.solve_dist(
        sharded, mesh, iters=ITERS, cg_iters=CG, damping=1e-4
    )
    poses, _, _ = run()
    jax.block_until_ready(poses)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        poses, _, _ = run()
        jax.block_until_ready(poses)
        best = min(best, time.perf_counter() - t0)
    return best


def work_balance(problem, n_dev):
    from aruco_slam_tpu.parallel import dist_ba

    sharded, _ = dist_ba.partition_problem(problem, n_dev)
    # per-shard observation counts: the unit of per-device work between
    # collectives (linearize + Schur elimination are per-observation /
    # per-landmark local)
    valid = np.asarray(sharded.obs_valid).reshape(n_dev, -1)
    counts = valid.sum(axis=1)
    return {
        "obs_per_device": counts.tolist(),
        "imbalance_max_over_mean": float(counts.max() / counts.mean()),
    }


def two_process_leg():
    """Time the 8-device solve as 1 process vs 2 processes (4 devices each,
    collectives crossing the process boundary)."""
    env = {
        **os.environ,
        "SCALING_WORKER_KF": str(N_KF),
        "SCALING_WORKER_LM": str(N_LM),
    }
    out = {}
    for n_proc in (1, 2):
        procs = [
            subprocess.Popen(
                [sys.executable, __file__],
                env={
                    **env,
                    "SCALING_WORKER": str(i),
                    "SCALING_NPROC": str(n_proc),
                },
                stdout=subprocess.PIPE if i == 0 else subprocess.DEVNULL,
                stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(n_proc)
        ]
        try:
            txt, _ = procs[0].communicate(timeout=600)
            for p in procs[1:]:
                p.wait(timeout=60)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        line = [l for l in txt.splitlines() if l.startswith("WORKER_TIME")]
        assert line, txt
        out[f"{n_proc}_process_s"] = float(line[0].split()[1])
    out["cross_process_efficiency"] = (
        out["1_process_s"] / out["2_process_s"]
    )
    return out


def worker(pid: int, n_proc: int) -> None:
    dev_per_proc = 8 // n_proc
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={dev_per_proc}"
    )
    if n_proc > 1:
        jax.distributed.initialize(
            coordinator_address="localhost:12356",
            num_processes=n_proc,
            process_id=pid,
        )
    from aruco_slam_tpu.models import graph_builder
    from aruco_slam_tpu.parallel import dist_ba

    n_dev = len(jax.devices())
    assert n_dev == 8, jax.devices()
    problem, _, _ = graph_builder.synthetic_ba_problem(
        int(os.environ["SCALING_WORKER_KF"]),
        int(os.environ["SCALING_WORKER_LM"]),
        obs_per_kf=OBS_PER_KF,
        seed=0,
    )
    sharded, _ = dist_ba.partition_problem(problem, n_dev)
    mesh = Mesh(np.array(jax.devices()), (dist_ba.AXIS,))
    run = lambda: dist_ba.solve_dist(
        sharded, mesh, iters=ITERS, cg_iters=CG, damping=1e-4
    )
    poses, _, _ = run()
    jax.block_until_ready(poses)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        poses, _, _ = run()
        jax.block_until_ready(poses)
        best = min(best, time.perf_counter() - t0)
    if pid == 0:
        print(f"WORKER_TIME {best:.4f}", flush=True)
    if n_proc > 1:
        jax.distributed.shutdown()


def main():
    from aruco_slam_tpu.models import graph_builder

    problem, _, _ = graph_builder.synthetic_ba_problem(
        N_KF, N_LM, obs_per_kf=OBS_PER_KF, seed=0
    )
    result = {
        "problem": {"keyframes": N_KF, "landmarks": N_LM, "obs_per_kf": OBS_PER_KF},
        "note": (
            "virtual 8-device CPU mesh on one host — devices share cores, so "
            "wall-clock strong scaling is not expected; work balance and the "
            "cross-process overhead are the hardware-independent evidence "
            "(collective counts are asserted in tests/test_parallel.py)"
        ),
        "work_balance": {
            str(n): work_balance(problem, n) for n in (2, 4, 8)
        },
    }
    strong = {}
    for n in (1, 2, 4, 8):
        strong[str(n)] = round(_solve_time(problem, n), 4)
    result["strong_scaling_wall_s"] = strong
    result["two_process"] = two_process_leg()
    path = os.path.join(os.path.dirname(__file__), "results.json")
    results = {}
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    results["scaling"] = result
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    if "SCALING_WORKER" in os.environ:
        worker(int(os.environ["SCALING_WORKER"]), int(os.environ["SCALING_NPROC"]))
    else:
        main()
