"""Local check of __graft_entry__.dryrun_multichip on an 8-way virtual CPU
mesh (mirrors the driver's invocation)."""

import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as ge

if __name__ == "__main__":
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.mu)
    print("entry ok")
    ge.dryrun_multichip(8)
    print("dryrun ok")
