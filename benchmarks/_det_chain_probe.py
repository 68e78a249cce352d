"""Tunnel-immune detector stage timing: each stage is applied K times
inside ONE jitted program (value-chained so XLA cannot CSE the
iterations); per-iteration cost = (t(K2) - t(K1)) / (K2 - K1). Immune to
the per-dispatch tunnel latency (~32 ms when degraded) that poisons
host-timed loops."""
import functools
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
from aruco_slam_tpu.sim import synthetic

B = int(os.environ.get("PROBE_B", "32"))
CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
CFG = det.DetectorConfig()
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    seq = synthetic.generate_sequence(
        synthetic.SimParams(duration=4.0, seed=0), level="images", camera=CAM
    )
imgs = jnp.asarray(np.asarray(seq.images)[:B]).astype(jnp.float32)
jax.block_until_ready(imgs)


def chained(stage_fn, k):
    """jit(imgs -> imgs perturbed by stage output, k times)."""

    @jax.jit
    def run(x):
        def body(c, _):
            out = stage_fn(c)
            # value-dependence: fold a scalar of the output back into the
            # input so iterations cannot be CSE'd or DCE'd
            c = c + 1e-30 * out
            return c, None

        c, _ = jax.lax.scan(body, x, None, length=k)
        return c[0, 0, 0]

    return run


def measure(name, stage_fn, k1=1, k2=5, reps=4):
    f1, f2 = chained(stage_fn, k1), chained(stage_fn, k2)
    np.asarray(f1(imgs)); np.asarray(f2(imgs))  # first-exec barriers
    t1 = min(
        (lambda t0: (jax.block_until_ready(f1(imgs)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(reps)
    )
    t2 = min(
        (lambda t0: (jax.block_until_ready(f2(imgs)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(reps)
    )
    per_iter = (t2 - t1) / (k2 - k1)
    print(f"{name:28s}: {1e3 * per_iter / B:7.3f} ms/frame "
          f"(t1={1e3*t1:.1f} t2={1e3*t2:.1f} ms)", flush=True)
    return per_iter / B


def thr_xla(x):
    fg = jax.vmap(
        lambda im: det.adaptive_threshold(im, CFG.adaptive_radius, CFG.adaptive_C, CFG.mean_stride)
    )(x)
    return fg.astype(jnp.float32)


def thr_ccl_kernel(x):
    from aruco_slam_tpu.ops.kernels import ccl as K

    def one(im):
        fg, lab = K.threshold_label_tpu(
            im, CFG.adaptive_radius, CFG.adaptive_C, CFG.mean_stride, CFG.ccl_rounds
        )
        return lab.reshape(im.shape).astype(jnp.float32)

    return jax.vmap(one)(x)


def thr_ccl_kernel_r(rounds):
    from aruco_slam_tpu.ops.kernels import ccl as K

    def f(x):
        def one(im):
            fg, lab = K.threshold_label_tpu(
                im, CFG.adaptive_radius, CFG.adaptive_C, CFG.mean_stride, rounds
            )
            return lab.reshape(im.shape).astype(jnp.float32)

        return jax.vmap(one)(x)

    return f


def ccl_xla(x):
    def one(im):
        fg = det.adaptive_threshold(im, CFG.adaptive_radius, CFG.adaptive_C, CFG.mean_stride)
        lab = det.label_components(fg, CFG.ccl_rounds)
        return lab.reshape(im.shape).astype(jnp.float32)

    return jax.vmap(one)(x)


def quads_from_kernel(x):
    def one(im):
        fg, lab = det._threshold_and_label(im, CFG.adaptive_radius, CFG)
        q, v = det.extract_quads(lab, fg, CFG)
        return jnp.zeros_like(im) + q.sum() + v.sum()

    return jax.vmap(one)(x)


def full(x):
    def one(im):
        d = det.detect_markers(im, CFG)
        return jnp.zeros_like(im) + d.corners.sum() + d.ids.sum()

    return jax.vmap(one)(x)


def stats_only(x):
    """extract_quads minus the per-candidate corner windows: the stats
    scatter + approx_max_k + bbox reductions."""

    def one(im):
        fg, labels = det._threshold_and_label(im, CFG.adaptive_radius, CFG)
        h, w = fg.shape
        n = h * w
        st = CFG.stats_stride
        labels2d = labels.reshape(h, w)
        lab_ds = labels2d[::st, ::st]
        fg_ds = fg[::st, ::st]
        cellf = lab_ds.reshape(-1)
        fgf = fg_ds.reshape(-1)
        counts = jnp.zeros((n,), jnp.int32).at[cellf].add(fgf.astype(jnp.int32))
        min_ds = max(1, CFG.min_component_pixels // (st * st) // 2)
        max_ds = jnp.int32(CFG.max_component_fraction * (n // (st * st)))
        ok = (counts >= min_ds) & (counts <= max_ds)
        score = jnp.where(ok, counts, 0)
        svals, cells_k = jax.lax.approx_max_k(
            score.astype(jnp.float32), CFG.max_candidates, recall_target=0.99
        )
        roots = cells_k.astype(jnp.int32)
        sel = (cellf[None, :] == roots[:, None]) & fgf[None, :]
        hs, ws = lab_ds.shape
        gy = (jnp.arange(hs, dtype=jnp.int32) * st)[:, None]
        gx = (jnp.arange(ws, dtype=jnp.int32) * st)[None, :]
        px_y = jnp.broadcast_to(gy, (hs, ws)).reshape(-1)
        px_x = jnp.broadcast_to(gx, (hs, ws)).reshape(-1)
        big = jnp.int32(n)
        bb = (
            jnp.min(jnp.where(sel, px_x[None, :], big), axis=1).sum()
            + jnp.max(jnp.where(sel, px_y[None, :], -1), axis=1).sum()
        )
        return jnp.zeros_like(im) + bb + svals.sum()

    return jax.vmap(one)(x)


def _quads_eager():
    def one(im):
        fg, lab = det._threshold_and_label(im, CFG.adaptive_radius, CFG)
        q, v = det.extract_quads(lab, fg, CFG)
        return q

    out = jax.jit(jax.vmap(one))(imgs)
    jax.block_until_ready(out)
    return out


FIXED_QUADS = _quads_eager()


def _get_quads():
    return FIXED_QUADS


def subpix_only(x):
    quads = _get_quads()

    def one(im, q):
        extent = jnp.max(jnp.max(q, axis=1) - jnp.min(q, axis=1), axis=-1)
        out = det.refine_corners_subpix(
            im, q, window=CFG.subpix_window, iters=CFG.subpix_iters,
            window_small=CFG.subpix_window_small,
            small=extent < CFG.subpix_small_extent,
        )
        return jnp.zeros_like(im) + out.sum()

    return jax.vmap(one)(x, quads)


def decode_only(x):
    quads = _get_quads()

    def one(im, q):
        mids, c, contrast, berr, ok = det.decode_candidates(im, q, CFG)
        return jnp.zeros_like(im) + c.sum() + mids.sum()

    return jax.vmap(one)(x, quads)


def copy_kernel_stage(x):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(i_ref, o_ref):
        o_ref[:] = i_ref[:] * 1.0000001

    def one(im):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(im.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(im)

    return jax.vmap(one)(x)


which = sys.argv[1:] or ["copy", "thr", "k1", "k4", "k8", "xla", "quads", "full"]
stages = {
    "copy": ("copy pallas kernel", copy_kernel_stage),
    "thr": ("threshold XLA", thr_xla),
    "k1": ("thr+ccl kernel r1", thr_ccl_kernel_r(1)),
    "k4": ("thr+ccl kernel r4", thr_ccl_kernel_r(4)),
    "k8": ("thr+ccl kernel r8", thr_ccl_kernel_r(8)),
    "xla": ("thr+ccl XLA r4", ccl_xla),
    "quads": ("thr+ccl+quads", quads_from_kernel),
    "full": ("full detect", full),
    "stats": ("thr+ccl+stats (no corners)", stats_only),
    "subpix": ("subpix only (fixed quads)", subpix_only),
    "decode": ("decode only (fixed quads)", decode_only),
}
for w in which:
    name, fn = stages[w]
    measure(name, fn)
