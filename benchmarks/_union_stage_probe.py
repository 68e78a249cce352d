"""Round-5: where does the fused closing-union's +0.26 ms/frame go?
Increments via the value-chained scan method of _det_chain_probe (stages
in scan are fine; only the FULL detect_markers in scan hits the
scheduling pathology). Batch 32, 480x640.

  kernel_single      fused threshold+CCL (rounds 4)
  kernel_union       + close + seeded closed CCL (2 rounds), one launch
  stats_single       kernel_single + component_candidates
  stats_union        kernel_union + merged two-source stats (one sort)
  cands_single       extract_quads path (stats + chain over 24)
  cands_union        _candidates_at_radius union (stats + chain over 48)
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

from aruco_slam_tpu.ops import detector as det
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.ops.kernels import ccl as K
from aruco_slam_tpu.sim import synthetic

B = int(os.environ.get("PROBE_B", "32"))
CFG = det.DetectorConfig()
CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    seq = synthetic.generate_sequence(
        synthetic.SimParams(duration=4.0, seed=0), level="images", camera=CAM
    )
imgs = jnp.asarray(np.asarray(seq.images)[:B]).astype(jnp.float32)
jax.block_until_ready(imgs)


def chained(stage_fn, k):
    @jax.jit
    def run(x):
        def body(c, _):
            out = stage_fn(c)
            return c + 1e-30 * out, None

        c, _ = jax.lax.scan(body, x, None, length=k)
        return c[0, 0, 0]

    return run


def measure(name, stage_fn, k1=1, k2=5, reps=4):
    f1, f2 = chained(stage_fn, k1), chained(stage_fn, k2)
    float(np.asarray(f1(imgs))); float(np.asarray(f2(imgs)))
    t1 = min(
        (lambda t0: (jax.block_until_ready(f1(imgs)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(reps)
    )
    t2 = min(
        (lambda t0: (jax.block_until_ready(f2(imgs)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(reps)
    )
    per = (t2 - t1) / (k2 - k1)
    print(f"{name:16s}: {1e3 * per / B:7.3f} ms/frame", flush=True)


r, C, s, rr = CFG.adaptive_radius, CFG.adaptive_C, CFG.mean_stride, CFG.ccl_rounds
cr = CFG.closed_ccl_rounds


def kernel_single(x):
    def one(im):
        fg, lab = K.threshold_label_tpu(im, r, C, s, rr)
        return lab.reshape(im.shape).astype(jnp.float32)
    return jax.vmap(one)(x)


def kernel_union(x):
    def one(im):
        fg, lab, fgc, labc = K.threshold_label_union_tpu(im, r, C, s, rr, cr)
        return (lab + labc).reshape(im.shape).astype(jnp.float32)
    return jax.vmap(one)(x)


def stats_single(x):
    def one(im):
        fg, lab = K.threshold_label_tpu(im, r, C, s, rr)
        roots, bbox, v, sv = det.component_candidates(lab, fg, CFG)
        return jnp.zeros_like(im) + jnp.sum(roots).astype(jnp.float32)
    return jax.vmap(one)(x)


def stats_union(x):
    def one(im):
        fg, lab, fgc, labc = K.threshold_label_union_tpu(im, r, C, s, rr, cr)
        (ra, _, _, _), (rb, _, _, _) = det._component_stats_multi(
            [lab, labc], [fg, fgc], CFG
        )
        return jnp.zeros_like(im) + (jnp.sum(ra) + jnp.sum(rb)).astype(jnp.float32)
    return jax.vmap(one)(x)


def cands_single(x):
    import dataclasses
    cfg1 = dataclasses.replace(CFG, closing_union=False)
    def one(im):
        q, v, _, _ = det._candidates_at_radius(im, r, cfg1)
        return jnp.zeros_like(im) + jnp.sum(q)
    return jax.vmap(one)(x)


def cands_union(x):
    def one(im):
        q, v, q2, v2 = det._candidates_at_radius(im, r, CFG)
        return jnp.zeros_like(im) + jnp.sum(q) + jnp.sum(q2)
    return jax.vmap(one)(x)


for nm, fn in (
    ("kernel_single", kernel_single),
    ("kernel_union", kernel_union),
    ("stats_single", stats_single),
    ("stats_union", stats_union),
    ("cands_single", cands_single),
    ("cands_union", cands_union),
):
    measure(nm, fn)
