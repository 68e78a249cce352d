"""Round-5 task 1 check: full-detector ms/frame via the PRODUCTION path
(runner.detect_frames chunked host loop, chunk 32) with the FUSED
closing-union megakernel vs closing_union=False. 256 frames = 8 pipelined
dispatches; warmup ends with a host fetch (gotcha 9); reported number is
the best of reps (tunnel variance guard).

NOTE: do NOT wrap detect_markers in lax.scan to chain reps — detection
inside scan hits the XLA:TPU scheduling pathology (docs/PERFORMANCE.md)
and the first attempt at this probe also hit a Mosaic bool-select compile
error only visible on real hardware. The host-chunk loop IS the shipped
execution shape.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from aruco_slam_tpu import runner
from aruco_slam_tpu.ops import detector as det
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import synthetic

F = int(os.environ.get("PROBE_F", "256"))
CHUNK = int(os.environ.get("PROBE_CHUNK", "32"))
CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    seq = synthetic.generate_sequence(
        synthetic.SimParams(duration=13.0, seed=0), level="images", camera=CAM
    )
imgs = jnp.asarray(np.asarray(seq.images)[:F])
jax.block_until_ready(imgs)
print(f"frames={imgs.shape}", flush=True)

import dataclasses

variants = [("union_fused", det.DetectorConfig())]
if os.environ.get("PROBE_NO_UNION", "1") == "1":
    variants.append(
        ("no_union", dataclasses.replace(det.DetectorConfig(), closing_union=False))
    )
if os.environ.get("PROBE_NO_RETRY"):
    variants.append(
        ("no_second_chance",
         dataclasses.replace(det.DetectorConfig(), second_chance=False))
    )
if os.environ.get("PROBE_RADII"):
    variants.append(
        ("radii_3_7_11",
         dataclasses.replace(det.DetectorConfig(), adaptive_radii=(3, 7, 11)))
    )

for name, cfg in variants:
    ids, corners, valid = runner.detect_frames(imgs, cfg, CHUNK)
    np.asarray(ids)  # true first-exec barrier
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        ids, corners, valid = runner.detect_frames(imgs, cfg, CHUNK)
        jax.block_until_ready((ids, corners, valid))
        best = min(best, time.perf_counter() - t0)
    print(
        f"{name}: {best / F * 1e3:.3f} ms/frame  ({F / best:.1f} frames/s; "
        f"n_valid={int(np.asarray(valid).sum())})",
        flush=True,
    )
