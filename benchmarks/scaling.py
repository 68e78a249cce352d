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


def two_process_leg(n_kf=N_KF, n_lm=N_LM, cg=CG, iters=ITERS):
    """Time the 8-device solve as 1 process vs 2 processes (4 devices each,
    collectives crossing the process boundary)."""
    env = {
        **os.environ,
        "SCALING_WORKER_KF": str(n_kf),
        "SCALING_WORKER_LM": str(n_lm),
        "SCALING_WORKER_CG": str(cg),
        "SCALING_WORKER_ITERS": str(iters),
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
            txt, _ = procs[0].communicate(timeout=1800)
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


def efficiency_curve():
    """Cross-process efficiency vs compute-per-collective (VERDICT round 2
    item 4): the 0.607 single point was measured at a small,
    overhead-dominated problem. Sweep problem size and CG depth, extract
    the fixed per-psum boundary overhead (the solve does one [K, 3] psum
    per CG iteration plus a handful per GN), and report at what
    compute-per-collective the >=80% BASELINE north star holds.

    Hardware-independent argument: efficiency = t1 / (t1 + n_psum * ovh)
    where ovh is the per-collective cost of crossing the process boundary
    (gRPC here; ICI on a pod is ~100x cheaper) and t1/n_psum is the
    compute-per-collective. Efficiency >= 0.8 whenever
    compute-per-collective >= 4 * ovh, regardless of transport.
    """
    sweep = [
        # (n_kf, n_lm, cg_iters, gn_iters)
        (2048, 1024, 40, 3),
        (2048, 1024, 200, 2),
        (10240, 5120, 40, 2),
        (10240, 5120, 200, 1),
        (40960, 20480, 40, 1),
        (40960, 20480, 200, 1),
    ]
    points = []
    for n_kf, n_lm, cg, iters in sweep:
        leg = two_process_leg(n_kf=n_kf, n_lm=n_lm, cg=cg, iters=iters)
        # collectives per solve: 1 psum per CG iteration + ~6 per GN
        # (rhs/cost/termination reductions — see parallel/dist_ba.py; the
        # exact count is asserted from compiled HLO in tests/test_parallel)
        n_psum = iters * (cg + 6)
        ovh = (leg["2_process_s"] - leg["1_process_s"]) / n_psum
        points.append(
            {
                "keyframes": n_kf,
                "landmarks": n_lm,
                "cg_iters": cg,
                "gn_iters": iters,
                "n_collectives": n_psum,
                "1_process_s": leg["1_process_s"],
                "2_process_s": leg["2_process_s"],
                "efficiency": round(leg["cross_process_efficiency"], 4),
                "compute_per_collective_ms": round(
                    1e3 * leg["1_process_s"] / n_psum, 3
                ),
                "overhead_per_collective_ms": round(1e3 * ovh, 3),
            }
        )
        print(json.dumps(points[-1]), flush=True)
    ovhs = [p["overhead_per_collective_ms"] for p in points]
    ovh_med = sorted(ovhs)[len(ovhs) // 2]
    above = [
        p for p in points
        if p["efficiency"] >= 0.8
    ]
    return {
        "points": points,
        "median_overhead_per_collective_ms": ovh_med,
        "efficiency_model": "eff = c / (c + ovh), c = compute-per-collective",
        "threshold_compute_per_collective_ms_for_80pct": round(
            4 * ovh_med, 3
        ),
        "smallest_problem_at_80pct": (
            {k: above[0][k] for k in ("keyframes", "landmarks", "cg_iters")}
            if above else None
        ),
    }


def psum_microbench():
    """Per-collective boundary cost, measured directly (not inferred from
    solve-time deltas, which conflate gRPC transport with host-core
    oversubscription when two processes share one machine): a lax.scan of
    100 chained [K, 3] psums inside ONE jitted shard_map, timed 1-process
    vs 2-process. The delta / 100 is the per-psum cost of crossing the
    process boundary at that payload."""
    out = {}
    for n_kf in (2048, 10240, 40960):
        row = {}
        for n_proc in (1, 2):
            procs = [
                subprocess.Popen(
                    [sys.executable, __file__],
                    env={
                        **os.environ,
                        "PSUM_WORKER": str(i),
                        "SCALING_NPROC": str(n_proc),
                        "SCALING_WORKER_KF": str(n_kf),
                    },
                    stdout=subprocess.PIPE if i == 0 else subprocess.DEVNULL,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
                for i in range(n_proc)
            ]
            try:
                txt, _ = procs[0].communicate(timeout=900)
                for p in procs[1:]:
                    p.wait(timeout=60)
            finally:
                for p in procs:
                    if p.poll() is None:
                        p.kill()
            line = [l for l in txt.splitlines() if l.startswith("PSUM_TIME")]
            assert line, txt
            row[f"{n_proc}_process_us_per_psum"] = float(line[0].split()[1])
        row["boundary_overhead_us_per_psum"] = round(
            row["2_process_us_per_psum"] - row["1_process_us_per_psum"], 1
        )
        row["payload_kib"] = round(n_kf * 3 * 4 / 1024, 1)
        out[str(n_kf)] = row
        print(json.dumps({n_kf: row}), flush=True)
    return out


def psum_worker(pid: int, n_proc: int) -> None:
    dev_per_proc = 8 // n_proc
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={dev_per_proc}"
    )
    if n_proc > 1:
        jax.distributed.initialize(
            coordinator_address="localhost:12357",
            num_processes=n_proc,
            process_id=pid,
        )
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    n_kf = int(os.environ["SCALING_WORKER_KF"])
    n_dev = len(jax.devices())
    assert n_dev == 8
    mesh = Mesh(np.array(jax.devices()), ("x",))
    N_PSUM = 100

    @jax.jit
    @partial(
        shard_map, mesh=mesh, in_specs=P(), out_specs=P(),
        check_rep=False,
    )
    def chain(x):
        # replicated [K, 3] operand — the same payload shape dist_ba's
        # Schur matvec psums once per CG iteration (dist_ba.py:323)
        def body(c, _):
            # data-dependent chain: each psum consumes the previous result
            s = jax.lax.psum(c, "x")
            return c + s * 1e-9, None

        c, _ = jax.lax.scan(body, x, None, length=N_PSUM)
        return c

    x = jnp.ones((n_kf, 3), jnp.float32)
    y = chain(x)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        y = chain(x)
        jax.block_until_ready(y)
        best = min(best, time.perf_counter() - t0)
    if pid == 0:
        print(f"PSUM_TIME {1e6 * best / N_PSUM:.1f}", flush=True)
    if n_proc > 1:
        jax.distributed.shutdown()


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
    w_cg = int(os.environ.get("SCALING_WORKER_CG", CG))
    w_iters = int(os.environ.get("SCALING_WORKER_ITERS", ITERS))
    run = lambda: dist_ba.solve_dist(
        sharded, mesh, iters=w_iters, cg_iters=w_cg, damping=1e-4
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
    result["psum_boundary_cost"] = psum_microbench()
    result["efficiency_curve"] = efficiency_curve()
    # Where does >=80% hold? eff = c / (c + ovh): the solve's
    # compute-per-collective c (measured, 1-process leg) vs the measured
    # per-psum boundary overhead at that payload. The gRPC numbers are this
    # host's transport; the MODEL is the hardware-independent part — on a
    # TPU pod the same [K, 3] psum rides ICI (~µs latency, ~100 GB/s), so
    # c_80 = 4 * ovh_ICI is orders of magnitude smaller than any real BA
    # problem's compute-per-collective.
    thresh = {}
    for k, row in result["psum_boundary_cost"].items():
        ovh_ms = row["boundary_overhead_us_per_psum"] / 1e3
        pts = [
            p for p in result["efficiency_curve"]["points"]
            if str(p["keyframes"]) == k
        ]
        thresh[k] = {
            "boundary_overhead_ms": round(ovh_ms, 3),
            "compute_per_collective_ms_for_80pct": round(4 * ovh_ms, 3),
            "measured_compute_per_collective_ms": [
                p["compute_per_collective_ms"] for p in pts
            ],
            "predicted_efficiency": [
                round(
                    p["compute_per_collective_ms"]
                    / (p["compute_per_collective_ms"] + ovh_ms),
                    3,
                )
                for p in pts
            ],
            "measured_efficiency": [p["efficiency"] for p in pts],
        }
    result["efficiency_threshold"] = thresh
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
    if "PSUM_WORKER" in os.environ:
        psum_worker(int(os.environ["PSUM_WORKER"]), int(os.environ["SCALING_NPROC"]))
    elif "SCALING_WORKER" in os.environ:
        worker(int(os.environ["SCALING_WORKER"]), int(os.environ["SCALING_NPROC"]))
    else:
        main()
