"""Probe: strong-scaling efficiency 1 host -> 2 hosts for the 10k/5k
distributed BA solve, emulated on loopback with a "host" = half this
machine's cores (taskset-pinned). Both legs run the SAME 4-way-sharded
SPMD program:

- leg A (1 host):  1 process, 4 virtual devices, pinned to cores 0..half-1
- leg B (2 hosts): 2 processes x 2 devices, each pinned to its own half,
  cross-process collectives over gloo (COLL=gloo) or default gRPC

efficiency = tA / (2 * tB)  — textbook strong scaling with doubled cores.
Run: python benchmarks/_2x1_probe.py  [COLL=gloo] [NKF=.. NLM=..]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N_KF = int(os.environ.get("NKF", 10240))
N_LM = int(os.environ.get("NLM", 5120))
CG, ITERS = int(os.environ.get("CGI", 40)), 2
N_SHARDS = int(os.environ.get("NSHARDS", 2))


def worker(pid: int, n_proc: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={N_SHARDS // n_proc}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if os.environ.get("COLL"):
        jax.config.update(
            "jax_cpu_collectives_implementation", os.environ["COLL"]
        )
    if n_proc > 1:
        jax.distributed.initialize(
            coordinator_address="localhost:12401",
            num_processes=n_proc,
            process_id=pid,
        )
    import numpy as np
    from jax.sharding import Mesh

    from aruco_slam_tpu.models import graph_builder
    from aruco_slam_tpu.parallel import dist_ba

    problem, _, _ = graph_builder.synthetic_ba_problem(
        N_KF, N_LM, obs_per_kf=8, seed=0
    )
    sharded, _ = dist_ba.partition_problem(problem, N_SHARDS)
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
    ncores = os.cpu_count()
    half = ncores // 2
    out = {}
    for n_proc in (1, 2):
        procs = []
        for i in range(n_proc):
            pin = ["taskset", "-c", f"{i * half}-{(i + 1) * half - 1}"]
            procs.append(
                subprocess.Popen(
                    pin + [sys.executable, __file__],
                    env={**os.environ, "W": str(i), "NP": str(n_proc)},
                    stdout=subprocess.PIPE if i == 0 else subprocess.DEVNULL,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
            )
        try:
            txt, _ = procs[0].communicate(timeout=1800)
            for p in procs[1:]:
                p.wait(timeout=60)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        line = [l for l in txt.splitlines() if l.startswith("WORKER_TIME")]
        if not line:
            print(txt[-3000:])
            return
        out[n_proc] = float(line[0].split()[1])
        print(f"{n_proc}host: {out[n_proc]:.3f} s", flush=True)
    n_psum = ITERS * (CG + 2) + 1
    print(f"strong-scaling efficiency 1->2 hosts: {out[1] / (2 * out[2]):.4f}")
    print(f"collectives per solve: {n_psum}")


if __name__ == "__main__":
    if "W" in os.environ:
        worker(int(os.environ["W"]), int(os.environ["NP"]))
    else:
        main()
