"""Offline replay runner (L4): deterministic, timestamp-driven, batchable.

Replaces the reference's callback-driven live loop (``ros::spin()`` at
src/aruco_slam_node.cpp:79 with Image/Encoder callbacks) with a two-level
``lax.scan``: outer over camera frames, inner over the encoder ticks that
precede each frame. One ``jit`` compiles the entire replay; ``vmap`` over a
leading batch axis gives multi-sequence replay (BASELINE.md config 3).
"""

from __future__ import annotations

import functools
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


@functools.lru_cache(maxsize=None)
def _detect_chunk_jit(det_cfg: DetectorConfig):
    # jit wrappers must be cached by config, NOT rebuilt per call — a fresh
    # jit(lambda) is a new cache key and recompiles every invocation.
    return jax.jit(jax.vmap(lambda im: detect_markers(im, det_cfg)))


def detect_frames(
    images: Array, det_cfg: DetectorConfig = DetectorConfig(), chunk: int = 32
):
    """Batched detection over a stack of frames ``[..., H, W]``.

    Runs OUTSIDE any scan: detection inside ``lax.scan``/``lax.map`` hits an
    XLA scheduling pathology on TPU (~3000x slower than the identical
    computation vmapped at top level — see docs/PERFORMANCE.md). Chunked
    host loop of jitted vmapped calls keeps peak memory bounded; since the
    bounding-box-window quad extractor (peak [chunk, K, W^2], not
    [chunk, K, H*W]) chunk 32+ fits easily and amortizes dispatch latency.

    Returns (ids [..., K], corners [..., K, 4, 2], valid [..., K]).
    """
    lead = images.shape[:-2]
    h, w = images.shape[-2:]
    # One host->device transfer for the whole stack, then slice on-device:
    # slicing a host (numpy) array per chunk issues one synchronous
    # transfer per chunk — ~1 s each through a remote-TPU tunnel, which
    # once turned this loop into 100 s/call (CLAUDE.md gotcha 3).
    flat = jnp.asarray(images).reshape(-1, h, w)
    n = flat.shape[0]
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        flat = jnp.concatenate(
            [flat, jnp.zeros((n_pad - n, h, w), flat.dtype)], axis=0
        )
    fn = _detect_chunk_jit(det_cfg)
    outs = [fn(flat[i: i + chunk]) for i in range(0, n_pad, chunk)]
    ids = jnp.concatenate([o.ids for o in outs])[:n]
    corners = jnp.concatenate([o.corners for o in outs])[:n]
    valid = jnp.concatenate([o.valid for o in outs])[:n]
    K = ids.shape[-1]
    return (
        ids.reshape(*lead, K),
        corners.reshape(*lead, K, 4, 2),
        valid.reshape(*lead, K),
    )


def _detections_to_corner_data(
    data: ReplayData, det_cfg: DetectorConfig, det_chunk: int = 32
) -> ReplayData:
    ids, corners, valid = detect_frames(data.images, det_cfg, det_chunk)
    return data._replace(
        obs_ids=ids, corners_px=corners, obs_valid=valid, images=None,
        obs_z=jnp.zeros((*ids.shape, 3), corners.dtype),
        obs_R=jnp.zeros((*ids.shape, 3, 3), corners.dtype),
    )


def frame_update_for(config: SlamConfig, batched: bool):
    """Select the frame-update backend (see EkfConfig.update_backend):
    the Pallas VMEM-resident kernel wins 3x at batch 1 on TPU, the XLA
    scan wins under vmap (benchmarks/ekf_kernel_probe.py)."""
    if config.ekf.fused_update:
        return ekf.update_fused
    be = config.ekf.update_backend
    use_pallas = be == "pallas" or (
        be == "auto" and not batched and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from aruco_slam_tpu.ops.kernels import ekf_update as kern

        return kern.frame_update
    return ekf.update


def replay(
    data: ReplayData,
    config: SlamConfig,
    camera: Optional[CameraIntrinsics] = None,
    level: str = "obs",
    det_cfg: DetectorConfig = DetectorConfig(),
    det_chunk: int = 32,
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
    det_chunk: int = 32,
) -> ReplayResult:
    """vmapped multi-sequence replay: every field of ``data`` carries a
    leading batch axis (io.sequence.stack_sequences)."""
    if level == "images":
        data = _detections_to_corner_data(data, det_cfg, det_chunk)
        level = "corners"
    return _replay_batch_jit(data, config, camera, level)


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
        data = replay_data_from_sequence(seq, level)
        result = replay(data, config, camera, level, det_cfg)
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
