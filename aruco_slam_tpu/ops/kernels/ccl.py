"""Pallas TPU kernel: VMEM-resident connected-component labeling.

The XLA formulation of ``ops.detector.label_components`` round-trips the
full label image through HBM on every shift/scan step (~190 us per
elementwise pass at 480x640, ~1.5 ms per round measured — see
benchmarks/ccl_micro_probe2.py), and the *previous* pointer-jumping
formulation spent 2.6 ms per full-image gather (48 of them = ~120 ms per
frame; gathers are lane-serial on TPU). This kernel keeps the label image
(1.2 MB at 640x480 int32 — far under the 16 MB VMEM budget) on-chip for
ALL rounds: HBM traffic is one read of the mask and one write of the
labels per frame, and every propagation step runs at VPU rate.

Algorithm is identical to the XLA version (so results are bit-identical,
asserted in tests/test_pallas_kernels.py): per round an 8-neighbor
min-propagation (diagonal links) followed by segmented min *run scans*
along rows then columns in both directions (a label crosses a whole
horizontal/vertical run per scan — Hillis-Steele with background pixels as
segment boundaries). Shifts are built from jnp.roll + iota edge masks:
pure elementwise/VPU ops, no gathers, no scatters, everything rank-2
(Mosaic layout constraints, see CLAUDE.md).

Replaces the hot half of cv::aruco::detectMarkers
(reference src/aruco_slam.cpp:313) at kernel level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _shift(x: Array, dy: int, dx: int, fill, row_ids: Array, col_ids: Array):
    """Shift a [H, W] array by (dy, dx) — positive = toward higher index —
    filling vacated edges, via roll + iota masks (no slicing/concat: static
    full-tile ops keep Mosaic layouts trivial)."""
    h, w = x.shape
    y = x
    if dy:
        y = jnp.roll(y, dy, axis=0)
        if dy > 0:
            y = jnp.where(row_ids < dy, fill, y)
        else:
            y = jnp.where(row_ids >= h + dy, fill, y)
    if dx:
        y = jnp.roll(y, dx, axis=1)
        if dx > 0:
            y = jnp.where(col_ids < dx, fill, y)
        else:
            y = jnp.where(col_ids >= w + dx, fill, y)
    return y


def _fg_from_image(x, radius, C, stride, row_ids, col_ids, h, w):
    """In-kernel adaptive threshold, bit-identical to
    ``detector.adaptive_threshold(img, radius, C, mean_stride=stride)``:
    every sum is exact integer arithmetic in f32 (block sums <= 16*255,
    windowed block-mean sums < 2^24 in 1/16 units), so any summation order
    gives the same value; the two divisions (by 16 and by win^2) are the
    same ops the XLA path performs.

    The windowed mean over the stride-subsampled block grid is built from
    CHAINED one-block clamped shifts (chaining a one-step clamped shift k
    times reads the edge-replicated block, exactly like the XLA path's
    edge padding) — no cumsum, which Mosaic doesn't lower."""
    s = stride
    r_ds = max(1, round(radius / s))

    def shift(v, dy, dx, fill):
        return _shift(v, dy, dx, fill, row_ids, col_ids)

    # 4x4 (s x s) block sums at block-anchor positions (y % s == 0, ...)
    t = x
    for k in range(1, s):
        t = t + shift(x, -k, 0, 0.0)
    b = t
    for k in range(1, s):
        b = b + shift(t, 0, -k, 0.0)
    bm = b * (1.0 / (s * s))  # block mean (exact: /16 is a power of two)

    def clamp_shift(v, dy, dx):
        sh = shift(v, dy, dx, 0.0)
        if dy > 0:
            return jnp.where(row_ids < dy, v, sh)
        if dy < 0:
            return jnp.where(row_ids >= h + dy, v, sh)
        if dx > 0:
            return jnp.where(col_ids < dx, v, sh)
        return jnp.where(col_ids >= w + dx, v, sh)

    def chain_sum(v, dy, dx):
        out = v
        cur = v
        for _ in range(r_ds):
            cur = clamp_shift(cur, dy, dx)
            out = out + cur
        return out

    rowsum = chain_sum(bm, s, 0) + chain_sum(bm, -s, 0) - bm
    winsum = chain_sum(rowsum, 0, s) + chain_sum(rowsum, 0, -s) - rowsum
    win = 2 * r_ds + 1
    mean = winsum / float(win * win)
    # nearest-upsample the block-anchor value across its s x s block
    for k in range(1, s):
        mean = jnp.where((row_ids % s) == k, clamp_shift(mean, 1, 0), mean)
    for k in range(1, s):
        mean = jnp.where((col_ids % s) == k, clamp_shift(mean, 0, 1), mean)
    return x < (mean - C)


def _ccl_body(fgm, row_ids, col_ids, h, w, rounds, init=None):
    big = jnp.int32(h * w)
    one = jnp.int32(1)
    idx = row_ids * w + col_ids
    if init is not None:
        # warm start (closing-union closed pass): seed fg pixels with the
        # converged raw labels — min-propagation is monotone, so a seed
        # between the fixed point and the from-scratch start converges to
        # the same labels in fewer rounds (see detector.label_components)
        idx = jnp.where(fgm, jnp.minimum(init, idx), idx)

    def shift(x, dy, dx, fill):
        return _shift(x, dy, dx, fill, row_ids, col_ids)

    def neighbor_min(lab):
        lab_m = jnp.where(fgm, lab, big)
        best = lab_m
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                best = jnp.minimum(best, shift(lab_m, dy, dx, big))
        return jnp.where(fgm, jnp.minimum(lab, best), lab)

    def seg_scan(lab, axis, reverse):
        """Segmented inclusive min-scan along ``axis`` (background = segment
        boundary), Hillis-Steele: log2(extent) doubling steps."""
        v = jnp.where(fgm, lab, big)
        f = jnp.where(fgm, jnp.int32(0), one)  # boundary flag as i32
        extent = (h, w)[axis]
        s = 1
        while s < extent:
            d = -s if reverse else s
            if axis == 0:
                vs = shift(v, d, 0, big)
                fs = shift(f, d, 0, one)
            else:
                vs = shift(v, 0, d, big)
                fs = shift(f, 0, d, one)
            v = jnp.where(f > 0, v, jnp.minimum(v, vs))
            f = jnp.maximum(f, fs)
            s *= 2
        return jnp.where(fgm, jnp.minimum(lab, v), lab)

    def round_fn(_, lab):
        # fori_loop (single homogeneous [H, W] i32 carry) instead of Python
        # unrolling: Mosaic stack-allocates the temporaries of every unrolled
        # round simultaneously (8 rounds = 53 MB > 16 MB VMEM); the loop
        # bounds live scratch to one round.
        lab = neighbor_min(lab)
        lab = seg_scan(lab, 1, False)
        lab = seg_scan(lab, 1, True)
        lab = seg_scan(lab, 0, False)
        lab = seg_scan(lab, 0, True)
        return lab

    return jax.lax.fori_loop(0, rounds, round_fn, idx)


def _close3(fgm, row_ids, col_ids):
    """In-kernel 3x3 binary closing, border convention identical to
    ``detector.binary_close3``: out-of-image reads background for the
    dilation and foreground for the erosion. Runs in int32 with min/max
    as and/or — boolean selects inside the kernel lower to an i8->i1
    ``arith.trunci`` Mosaic cannot compile (measured on-device; the
    interpret path accepted it)."""
    x = fgm.astype(jnp.int32)

    def shift(v, dy, dx, fill):
        return _shift(v, dy, dx, fill, row_ids, col_ids)

    dil = x
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                dil = jnp.maximum(dil, shift(x, dy, dx, 0))
    ero = dil
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                ero = jnp.minimum(ero, shift(dil, dy, dx, 1))
    return ero > 0


def _ccl_kernel(fg_ref, out_ref, *, rounds: int, h: int, w: int):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    fgm = fg_ref[:] > 0  # bool mask in VMEM
    out_ref[:] = _ccl_body(fgm, row_ids, col_ids, h, w, rounds)


def _ccl_seeded_kernel(fg_ref, init_ref, out_ref, *, rounds: int, h: int,
                       w: int):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    fgm = fg_ref[:] > 0
    out_ref[:] = _ccl_body(
        fgm, row_ids, col_ids, h, w, rounds, init=init_ref[:]
    )


def _threshold_ccl_kernel(
    img_ref, fg_out, lab_out, *, rounds: int, h: int, w: int,
    radius: int, C: float, stride: int,
):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    x = img_ref[:].astype(jnp.float32)
    fgm = _fg_from_image(x, radius, C, stride, row_ids, col_ids, h, w)
    fg_out[:] = fgm.astype(jnp.int32)
    lab_out[:] = _ccl_body(fgm, row_ids, col_ids, h, w, rounds)


def _threshold_ccl_union_kernel(
    img_ref, fg_out, lab_out, fgc_out, labc_out, *, rounds: int,
    closed_rounds: int, h: int, w: int, radius: int, C: float, stride: int,
):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    x = img_ref[:].astype(jnp.float32)
    fgm = _fg_from_image(x, radius, C, stride, row_ids, col_ids, h, w)
    fgc = _close3(fgm, row_ids, col_ids)
    fg_out[:] = fgm.astype(jnp.int32)
    fgc_out[:] = fgc.astype(jnp.int32)
    lab = _ccl_body(fgm, row_ids, col_ids, h, w, rounds)
    lab_out[:] = lab
    labc_out[:] = _ccl_body(
        fgc, row_ids, col_ids, h, w, closed_rounds, init=lab
    )


@functools.partial(
    jax.jit,
    static_argnames=("radius", "C", "stride", "rounds", "closed_rounds",
                     "interpret"),
)
def threshold_label_union_tpu(
    img: Array,
    radius: int,
    C: float,
    stride: int,
    rounds: int,
    closed_rounds: int | None = None,
    interpret: bool = False,
):
    """Closing-union megakernel: adaptive threshold, 3x3 closing, and CCL
    over BOTH the raw and the closed foreground in ONE launch — one HBM
    read of the image replaces the unfused triple (threshold+CCL kernel,
    XLA close round-trip, second CCL kernel) the round-4 ``closing_union``
    default paid +0.45 ms/frame for (VERDICT r4 weak 1). Each stage is
    bit-identical to its unfused counterpart (asserted in
    tests/test_pallas_kernels.py): the threshold matches
    ``detector.adaptive_threshold``, the close matches
    ``detector.binary_close3``, and both label images match
    ``detector.label_components`` on their masks.

    The closed labeling is SEEDED with the converged raw labels and runs
    ``closed_rounds`` (default = ``rounds``) propagation rounds — only the
    bridge-crossing + re-flood work remains, so the detector ships
    closed_rounds=2 (DetectorConfig.closed_ccl_rounds, parity-checked).

    Returns (fg [H, W] bool, labels [H*W] i32, fg_closed, labels_closed).
    Same alignment contract as :func:`threshold_label_tpu`.
    """
    h, w = img.shape
    if closed_rounds is None:
        closed_rounds = rounds
    if h % 8 or w % 128 or h % stride or w % stride:
        raise ValueError(f"image {h}x{w} not aligned for stride {stride}")
    fg, lab, fgc, labc = pl.pallas_call(
        functools.partial(
            _threshold_ccl_union_kernel, rounds=rounds,
            closed_rounds=closed_rounds, h=h, w=w,
            radius=radius, C=C, stride=stride,
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((h, w), jnp.int32) for _ in range(4)
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(img.astype(jnp.float32))
    return fg > 0, lab.reshape(-1), fgc > 0, labc.reshape(-1)


@functools.partial(jax.jit, static_argnames=("rounds", "interpret"))
def label_components_tpu(
    fg: Array, rounds: int, interpret: bool = False, init: Array | None = None
) -> Array:
    """VMEM-resident CCL for one [H, W] bool mask. Returns flat labels
    [H*W] with the same convention as ``detector.label_components`` (fg
    pixel -> min flat index of its component, bg pixel -> own index).

    ``init`` ([H, W] int32): optional warm-start labels (same semantics
    as ``detector.label_components(init=...)``) — used by the staged
    closing-union fallback at frame sizes past the fused union kernel's
    Mosaic VMEM ceiling (1080p fails to compile the 2-label-image fused
    form; each single-image kernel fits).

    H must be a multiple of 8 and W a multiple of 128 (VPU tiling); the
    camera formats used here (640x480 et al.) already are.
    """
    h, w = fg.shape
    if h % 8 or w % 128:
        raise ValueError(f"image {h}x{w} not (8,128)-tile aligned")
    if init is not None:
        out = pl.pallas_call(
            functools.partial(_ccl_seeded_kernel, rounds=rounds, h=h, w=w),
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
            interpret=interpret,
        )(fg.astype(jnp.int32), init.astype(jnp.int32))
        return out.reshape(-1)
    out = pl.pallas_call(
        functools.partial(_ccl_kernel, rounds=rounds, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(fg.astype(jnp.int32))
    return out.reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("radius", "C", "stride", "rounds", "interpret")
)
def threshold_label_tpu(
    img: Array,
    radius: int,
    C: float,
    stride: int,
    rounds: int,
    interpret: bool = False,
):
    """Fused adaptive threshold + CCL megakernel: one HBM read of the
    image, one write each of (fg, labels); the thresholded mask never
    round-trips through HBM between the stages. Bit-identical to
    ``detector.adaptive_threshold(..., mean_stride=stride)`` followed by
    ``detector.label_components`` (asserted in tests) — the threshold's
    arithmetic is exact-integer until its two divisions, so the in-kernel
    chained-shift formulation reproduces the XLA cumsum formulation
    exactly.

    Returns (fg [H, W] bool, labels [H*W] int32). Requires (8, 128)-tile
    alignment and H, W divisible by ``stride``.
    """
    h, w = img.shape
    if h % 8 or w % 128 or h % stride or w % stride:
        raise ValueError(f"image {h}x{w} not aligned for stride {stride}")
    fg, lab = pl.pallas_call(
        functools.partial(
            _threshold_ccl_kernel, rounds=rounds, h=h, w=w,
            radius=radius, C=C, stride=stride,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        # The default 16 MB scoped-vmem stack overflows (17.5 MB) when a
        # vmapped batch >= ~64 makes Mosaic pipeline more buffers; the
        # kernel's live set is far under the chip's 128 MB VMEM, so raise
        # the limit instead of capping the detect chunk size.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(img.astype(jnp.float32))
    return fg > 0, lab.reshape(-1)
