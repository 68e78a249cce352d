"""Micro-breakdown of extract_quads at batch: which part of the 14 ms/frame
is the bottleneck (scatter stats / top_k / window gathers / argmax chains)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aruco_slam_tpu.ops import detector as det
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import synthetic

CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
CFG = det.DetectorConfig()

cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    seq = synthetic.generate_sequence(
        synthetic.SimParams(duration=2.0, seed=0), level="images", camera=CAM
    )
imgs = jnp.asarray(np.asarray(seq.images))
B = imgs.shape[0]
fg = jax.jit(jax.vmap(lambda im: det.adaptive_threshold(im, CFG.adaptive_radius, CFG.adaptive_C)))(imgs)
from aruco_slam_tpu.ops.kernels import ccl as ccl_kernel
labels = jax.jit(jax.vmap(lambda m: ccl_kernel.label_components_tpu(m, CFG.ccl_rounds)))(fg)
jax.block_until_ready(labels)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # true first-exec barrier (axon)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


h, w = 480, 640
n = h * w


def part_counts(labels, fg):
    fg_f = fg.reshape(-1)
    return jnp.zeros((n,), jnp.int32).at[labels].add(fg_f.astype(jnp.int32))


def part_bbox(labels, fg):
    fg_f = fg.reshape(-1)
    idx = jnp.arange(n, dtype=jnp.int32)
    ys_i = idx // w
    xs_i = idx % w
    big = jnp.int32(n)
    bb_minx = jnp.full((n,), big, jnp.int32).at[labels].min(jnp.where(fg_f, xs_i, big))
    bb_maxx = jnp.full((n,), -1, jnp.int32).at[labels].max(jnp.where(fg_f, xs_i, -1))
    bb_miny = jnp.full((n,), big, jnp.int32).at[labels].min(jnp.where(fg_f, ys_i, big))
    bb_maxy = jnp.full((n,), -1, jnp.int32).at[labels].max(jnp.where(fg_f, ys_i, -1))
    return bb_minx, bb_maxx, bb_miny, bb_maxy


def part_topk(counts, labels, fg):
    fg_f = fg.reshape(-1)
    idx = jnp.arange(n, dtype=jnp.int32)
    is_root = fg_f & (labels == idx)
    max_pix = jnp.int32(CFG.max_component_fraction * n)
    ok = is_root & (counts >= CFG.min_component_pixels) & (counts <= max_pix)
    score = jnp.where(ok, counts, 0)
    _, roots = jax.lax.top_k(score, CFG.max_candidates)
    return roots, score


t, counts = timeit(jax.jit(jax.vmap(part_counts)), labels, fg)
print(f"counts scatter : {1e3*t/B:8.2f} ms/frame", flush=True)
t, bbox = timeit(jax.jit(jax.vmap(part_bbox)), labels, fg)
print(f"bbox scatters  : {1e3*t/B:8.2f} ms/frame", flush=True)
t, (roots, score) = timeit(jax.jit(jax.vmap(part_topk)), counts, labels, fg)
print(f"topk+root      : {1e3*t/B:8.2f} ms/frame", flush=True)

bb_minx, bb_maxx, bb_miny, bb_maxy = bbox
W = CFG.corner_window
span = jnp.arange(W, dtype=jnp.int32)


def corners_part(labels, roots, bb):
    bb_minx, bb_maxx, bb_miny, bb_maxy = bb
    labels2d = labels.reshape(h, w)

    def corners_for(root):
        x0, x1 = bb_minx[root], bb_maxx[root]
        y0, y1 = bb_miny[root], bb_maxy[root]
        extent = jnp.maximum(x1 - x0, y1 - y0) + 1
        stride = jnp.maximum((extent + W - 1) // W, 1)
        wy = jnp.clip(y0 + stride * span, 0, h - 1)
        wx = jnp.clip(x0 + stride * span, 0, w - 1)
        lab_w = labels2d[wy[:, None], wx[None, :]]
        mask = (lab_w == root).reshape(-1)
        px = jnp.broadcast_to(wx[None, :].astype(jnp.float32), (W, W)).reshape(-1)
        py = jnp.broadcast_to(wy[:, None].astype(jnp.float32), (W, W)).reshape(-1)
        m = mask.astype(jnp.float32)
        npix = jnp.maximum(jnp.sum(m), 1.0)
        cx = jnp.sum(px * m) / npix
        cy = jnp.sum(py * m) / npix
        d0 = (px - cx) ** 2 + (py - cy) ** 2
        i0 = det._masked_argmax(d0, mask)
        p0 = jnp.stack([px[i0], py[i0]])
        d1 = (px - p0[0]) ** 2 + (py - p0[1]) ** 2
        i2 = det._masked_argmax(d1, mask)
        p2 = jnp.stack([px[i2], py[i2]])
        ex, ey = p2[0] - p0[0], p2[1] - p0[1]
        cross = ex * (py - p0[1]) - ey * (px - p0[0])
        i1 = det._masked_argmax(-cross, mask)
        i3 = det._masked_argmax(cross, mask)
        p1 = jnp.stack([px[i1], py[i1]])
        p3 = jnp.stack([px[i3], py[i3]])
        return jnp.stack([p0, p1, p2, p3])

    return jax.vmap(corners_for)(roots)


t, _ = timeit(jax.jit(jax.vmap(corners_part)), labels, roots, bbox)
print(f"corner windows : {1e3*t/B:8.2f} ms/frame", flush=True)

t, _ = timeit(jax.jit(jax.vmap(lambda l, m: det.extract_quads(l, m, CFG))), labels, fg)
print(f"extract_quads  : {1e3*t/B:8.2f} ms/frame", flush=True)
