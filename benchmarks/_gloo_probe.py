"""Probe: cross-process [K, 3] psum cost under (a) 1 process / 8 devices,
(b) 2 unpinned processes, (c) 2 processes pinned to disjoint cores (the
loopback model of two hosts: each has its own cores). Also gloo vs default
collectives. Run: python benchmarks/_gloo_probe.py"""

import os
import subprocess
import sys
import time


def chain_bench(n_psum=100):
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("x",))

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(), out_specs=P(), check_rep=False)
    def chain(x):
        def body(c, _):
            s = jax.lax.psum(c, "x")
            return c + s * 1e-9, None

        c, _ = jax.lax.scan(body, x, None, length=n_psum)
        return c

    x = jnp.ones((10240, 3), jnp.float32)
    y = chain(x)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        y = chain(x)
        jax.block_until_ready(y)
        best = min(best, time.perf_counter() - t0)
    return 1e6 * best / n_psum


def worker(pid: int, impl: str) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if impl != "default":
        jax.config.update("jax_cpu_collectives_implementation", impl)
    jax.distributed.initialize(
        coordinator_address="localhost:12399",
        num_processes=2,
        process_id=pid,
    )
    us = chain_bench()
    if pid == 0:
        print(f"PSUM_US {us:.1f}", flush=True)
    jax.distributed.shutdown()


def single() -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")
    print(f"PSUM_US {chain_bench():.1f}", flush=True)


def main():
    ncores = os.cpu_count()
    half = ncores // 2
    pins = [f"0-{half-1}", f"{half}-{ncores-1}"]
    cases = [
        ("1proc-8dev", None, None),
        ("2proc-default", "default", None),
        ("2proc-gloo", "gloo", None),
        ("2proc-default-pinned", "default", pins),
        ("2proc-gloo-pinned", "gloo", pins),
    ]
    for name, impl, pin in cases:
        if impl is None:
            txt = subprocess.run(
                [sys.executable, __file__],
                env={**os.environ, "GLOO_SINGLE": "1"},
                capture_output=True, text=True, timeout=300,
            ).stdout
        else:
            procs = [
                subprocess.Popen(
                    (["taskset", "-c", pin[i]] if pin else [])
                    + [sys.executable, __file__],
                    env={**os.environ, "GLOO_WORKER": str(i), "GLOO_IMPL": impl},
                    stdout=subprocess.PIPE if i == 0 else subprocess.DEVNULL,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
                for i in range(2)
            ]
            try:
                txt, _ = procs[0].communicate(timeout=300)
                for p in procs[1:]:
                    p.wait(timeout=60)
            finally:
                for p in procs:
                    if p.poll() is None:
                        p.kill()
        line = [l for l in txt.splitlines() if l.startswith("PSUM_US")]
        print(name, "->", line[0] if line else "FAILED", flush=True)
        if not line:
            print(txt[-2000:])


if __name__ == "__main__":
    if "GLOO_SINGLE" in os.environ:
        single()
    elif "GLOO_WORKER" in os.environ:
        worker(int(os.environ["GLOO_WORKER"]), os.environ["GLOO_IMPL"])
    else:
        main()
