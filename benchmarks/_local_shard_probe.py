"""Two INDEPENDENT processes each run one shard's worth of the 10k/5k
distributed solve (1-device mesh, psums are no-ops). Wall time here is the
pure per-process compute of the 2x1 distributed leg; the distributed leg's
excess over this is the true collective+rendezvous cost."""
import os, subprocess, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

def worker(pid):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh
    from aruco_slam_tpu.models import graph_builder
    from aruco_slam_tpu.parallel import dist_ba
    problem, _, _ = graph_builder.synthetic_ba_problem(10240, 5120, obs_per_kf=8, seed=0)
    sharded, _ = dist_ba.partition_problem(problem, 2)
    # keep only this process's shard; 1-device mesh
    shard = jax.tree.map(lambda x: x[pid:pid+1] if x.ndim and x.shape[0] == 2 else x, sharded)
    # fields with leading dim == n_shards are the sharded ones; replicated
    # fields (poses [K,3], odo, prior) pass through untouched
    mesh = Mesh(np.array(jax.devices()), (dist_ba.AXIS,))
    run = lambda: dist_ba.solve_dist(shard, mesh, iters=2, cg_iters=40, damping=1e-4)
    poses, _, _ = run(); jax.block_until_ready(poses)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        poses, _, _ = run(); jax.block_until_ready(poses)
        best = min(best, time.perf_counter() - t0)
    print(f"LOCAL_TIME {pid} {best:.4f}", flush=True)

if __name__ == "__main__":
    if "W" in os.environ:
        worker(int(os.environ["W"]))
    else:
        procs = [subprocess.Popen([sys.executable, __file__],
                 env={**os.environ, "W": str(i)}, stdout=subprocess.PIPE,
                 stderr=subprocess.STDOUT, text=True) for i in range(2)]
        for p in procs:
            txt, _ = p.communicate(timeout=900)
            print([l for l in txt.splitlines() if l.startswith("LOCAL_TIME")])
