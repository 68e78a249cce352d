"""Psum-chain cost across loopback topologies: (procs x devices, pinned?)."""
import os, subprocess, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

def worker(pid, n_proc, dev_per_proc):
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={dev_per_proc}"
    import jax
    jax.config.update("jax_platforms", "cpu")
    if n_proc > 1:
        jax.distributed.initialize("localhost:12403", n_proc, pid)
    from functools import partial
    import jax.numpy as jnp, numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()), ("x",))
    N = 100
    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(), out_specs=P(), check_rep=False)
    def chain(x):
        def body(c, _):
            return c + jax.lax.psum(c, "x") * 1e-9, None
        c, _ = jax.lax.scan(body, x, None, length=N)
        return c
    x = jnp.ones((10240, 3), jnp.float32)
    y = chain(x); jax.block_until_ready(y)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(x))
        best = min(best, time.perf_counter() - t0)
    if pid == 0:
        print(f"PSUM_US {1e6*best/N:.1f}", flush=True)
    if n_proc > 1:
        jax.distributed.shutdown()

def run(n_proc, dev_per_proc, pin):
    ncores = os.cpu_count(); half = ncores // 2
    procs = []
    for i in range(n_proc):
        pre = ["taskset", "-c", f"{i*half}-{(i+1)*half-1}"] if (pin and n_proc == 2) else []
        procs.append(subprocess.Popen(
            pre + [sys.executable, __file__],
            env={**os.environ, "W": str(i), "NP": str(n_proc), "DPP": str(dev_per_proc)},
            stdout=subprocess.PIPE if i == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT, text=True))
    txt, _ = procs[0].communicate(timeout=300)
    for p in procs[1:]:
        p.wait(timeout=60)
    line = [l for l in txt.splitlines() if l.startswith("PSUM_US")]
    print(f"{n_proc}x{dev_per_proc} pin={pin} ->", line[0] if line else txt[-1500:], flush=True)

if __name__ == "__main__":
    if "W" in os.environ:
        worker(int(os.environ["W"]), int(os.environ["NP"]), int(os.environ["DPP"]))
    else:
        run(2, 1, True); run(2, 1, False); run(2, 2, True); run(1, 2, False)
