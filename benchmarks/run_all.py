"""Benchmark harness over the five BASELINE.md configs.

Writes benchmarks/results.json and prints a summary. Run on the target
device (TPU); config 1 is CPU-runnable per BASELINE.md.

Timing discipline: steady-state after jit warmup, block_until_ready, and
inputs *perturbed per repetition* so no layer can cache/dedupe executions.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from aruco_slam_tpu import runner
from aruco_slam_tpu.io import map_io
from aruco_slam_tpu.models import ba, graph_builder
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import synthetic
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)


def timeit(fn, inputs, reps=5):
    """Returns (seconds_per_call, last_output).

    Warmup ends with a host FETCH, not just block_until_ready: on the
    remote-TPU (axon) backend block_until_ready does NOT wait for the
    first execution of a program (async compile/executable load) — only a
    device_get is a true barrier there. After one completed execution,
    block_until_ready behaves normally (measured in round 2)."""
    # warm up EVERY distinct input: inputs may compile to distinct
    # executables (e.g. per-problem degree-class bucket table shapes in
    # the BA configs), and a cold compile inside the timed loop would
    # dominate the measurement
    for inp in inputs[: max(1, min(len(inputs), reps))]:
        out = fn(inp)
        np.asarray(jax.tree.leaves(out)[0])  # full sync (see docstring)
    t0 = time.perf_counter()
    for r in range(reps):
        out = fn(inputs[r % len(inputs)])
        jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps, out


def config1_reference_arena():
    arena = map_io.load_map(
        os.path.join(os.path.dirname(__file__), "..", "map", "reference_arena.txt")
    )
    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=16, max_observations_per_frame=8))
    seq = synthetic.generate_sequence(
        synthetic.SimParams(duration=60.0, seed=2, max_obs=8), marker_map=arena
    )
    res = runner.evaluate_sequence(seq, cfg)
    data = runner.replay_data_from_sequence(seq)
    dt, _ = timeit(lambda d: runner.replay(d, cfg), [data], reps=5)
    return {
        "ate_m": res["ate"],
        "map_rmse_m": res["map_rmse"],
        "n_landmarks": res["n_landmarks"],
        "frames_per_sec": seq.num_frames / dt,
    }


def config2_loop_100():
    from aruco_slam_tpu import pipeline

    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=128, max_observations_per_frame=16))
    arena = synthetic.make_arena(n_markers=100, width=20.0, height=16.0)
    seq = synthetic.generate_sequence(
        synthetic.SimParams(
            duration=210.0, profile="tour", tour_width=20.0, tour_height=16.0,
            tour_inset=1.6, encoder_noise=0.4, fov_deg=90.0,
            max_view_angle_deg=85.0, seed=11,
        ),
        marker_map=arena,
    )
    res = runner.evaluate_sequence(seq, cfg)
    # warm wall: the first call pays jit compilation (minutes cold through
    # the tunnel, and any code change invalidates the persistent cache) —
    # time the second call, which is what a deployed smoother pays per map
    out = pipeline.ekf_then_ba(seq, cfg)
    jax.block_until_ready(out["poses"])
    t0 = time.time()
    out = pipeline.ekf_then_ba(seq, cfg)
    jax.block_until_ready(out["poses"])
    ba_wall = time.time() - t0
    id_to_true = {
        int(i): seq.true_landmarks[k] for k, i in enumerate(seq.true_landmark_ids)
    }
    lms = np.asarray(out["landmarks"])
    ba_err = float(
        np.mean(
            [
                np.linalg.norm(lms[s, :2] - id_to_true[int(a)][:2])
                for s, a in enumerate(out["landmark_ids"])
            ]
        )
    )
    # Pose-graph leg (the formulation BASELINE config 2 names): marker
    # re-observations as relative-pose closures, landmark-free solve,
    # landmarks recomposed from the optimized poses. Same warm-wall
    # protocol.
    pg = pipeline.ekf_then_pose_graph(seq, cfg)
    jax.block_until_ready(pg["poses"])
    t0 = time.time()
    pg = pipeline.ekf_then_pose_graph(seq, cfg)
    jax.block_until_ready(pg["poses"])
    pg_wall = time.time() - t0
    pg_lms = np.asarray(pg["landmarks"])
    pg_err = float(
        np.mean(
            [
                np.linalg.norm(pg_lms[s, :2] - id_to_true[int(a)][:2])
                for s, a in enumerate(pg["landmark_ids"])
            ]
        )
    )
    return {
        "ekf_ate_m": res["ate"],
        "ekf_map_rmse_m": res["map_rmse"],
        "ba_map_err_m": ba_err,
        "ba_wall_s": ba_wall,
        "pose_graph_map_err_m": pg_err,
        "pose_graph_wall_s": pg_wall,
        "pose_graph_n_closures": int(pg["n_closures"]),
        "n_landmarks": res["n_landmarks"],
    }


def config3_batched(batch=256):
    # Batch 256 = two full 128-lane tiles of the lanes-trailing kernels —
    # the bench.py headline shape (benchmarks/batch_size_sweep.py:
    # 64/96/128/192/256 -> 122k/146k/175k/162k/182k fps/chip). One suite,
    # one set of shapes (VERDICT r4 weak 4). This leg reads ~4% below
    # bench.py at the same batch (174.0k vs 181.7k, measured back-to-back
    # round 5) because it replays 30 s sequences (900 frames/dispatch)
    # vs bench.py's 60 s (1800): the fixed per-dispatch tunnel cost is
    # amortized over half as many frames. Same program, same math.
    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=32, max_observations_per_frame=16))
    seqs = [
        synthetic.generate_sequence(
            synthetic.SimParams(duration=30.0, seed=s), level="corners", camera=CAM
        )
        for s in range(4)
    ]
    f, epf = seqs[0].num_frames, seqs[0].enc_per_frame
    reps = -(-batch // len(seqs))
    stack = lambda n: np.concatenate(
        [np.stack([getattr(s, n) for s in seqs])] * reps
    )[:batch]

    def make(jit_seed):
        rng = np.random.default_rng(jit_seed)
        c = stack("corners_px") + rng.normal(scale=0.01, size=(batch, f, seqs[0].max_obs, 4, 2)).astype(np.float32)
        return runner.ReplayData(
            enc_w=jnp.asarray(stack("enc_w").reshape(batch, f, epf, 2)),
            enc_dt=jnp.asarray(stack("enc_dt").reshape(batch, f, epf)),
            obs_ids=jnp.asarray(stack("obs_ids")),
            obs_z=jnp.asarray(stack("obs_z")),
            obs_R=jnp.asarray(stack("obs_R")),
            obs_valid=jnp.asarray(stack("obs_valid")),
            corners_px=jnp.asarray(c),
        )

    inputs = [make(s) for s in range(3)]
    dt, _ = timeit(
        lambda d: runner.replay_batch(d, cfg, CAM, "corners"), inputs, reps=6
    )
    return {"batch": batch, "frames_per_sec_per_chip": batch * f / dt}


def config_image_level(batch=32, duration=10.0):
    """Full image pipeline throughput: rendered 640x480 frames -> detector
    -> PnP -> EKF, batched. (Not a numbered BASELINE config; reported as
    the detection-inclusive counterpart of config 3.)"""
    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=32, max_observations_per_frame=24))
    cpu = jax.devices("cpu")[0]
    seqs = []
    with jax.default_device(cpu):
        for s in range(min(batch, 4)):
            seqs.append(
                synthetic.generate_sequence(
                    synthetic.SimParams(duration=duration, seed=s),
                    level="images",
                    camera=CAM,
                )
            )
    f = seqs[0].num_frames
    data = runner.build_batch_data(seqs, batch, "images")
    # Device-resident input: measure the on-device pipeline, not the
    # host->device tunnel (246 MB of frames; input IO is benchmarked
    # separately by the native seqio loader).
    data = jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None, data
    )
    dt, _ = timeit(
        lambda d: runner.replay_batch(d, cfg, CAM, "images"), [data], reps=3
    )
    # batch sweep (VERDICT round 2 item 7): shorter sequences to bound
    # device memory at the larger batches (uint8 frames, [B, F, H, W])
    sweep = {}
    with jax.default_device(cpu):
        sweep_seqs = [
            synthetic.generate_sequence(
                synthetic.SimParams(duration=4.0, seed=s),
                level="images", camera=CAM,
            )
            for s in range(2)
        ]
    fs = sweep_seqs[0].num_frames
    for b in (16, 32, 64):
        d_b = runner.build_batch_data(sweep_seqs, b, "images")
        d_b = jax.tree.map(
            lambda x: jnp.asarray(x) if x is not None else None, d_b
        )
        dt_b, _ = timeit(
            lambda d: runner.replay_batch(d, cfg, CAM, "images"), [d_b], reps=3
        )
        sweep[str(b)] = round(b * fs / dt_b, 1)
    # sanity: the pipeline must actually track
    res = runner.evaluate_sequence(seqs[0], cfg, camera=CAM, level="images")
    return {
        "batch": batch,
        "frames_per_sec_per_chip": batch * f / dt,
        "batch_sweep_frames_per_sec": sweep,
        "single_seq_ate_m": res["ate"],
    }


def config4_ba(n_kf=1000, n_lm=500, iters=10, cg=50):
    # (packed, tables, static) kept PER problem: a seed with a different
    # max obs-per-keyframe width would make a shared static's dense
    # reshape wrong-shaped (ADVICE round 2). functools.lru-style jit
    # caching dedupes compilation when statics do coincide.
    problems = []
    for s in range(3):
        p, _, _ = graph_builder.synthetic_ba_problem(
            n_kf, n_lm, obs_per_kf=8, seed=s
        )
        problems.append(ba.prepare(p))

    @functools.lru_cache(maxsize=None)
    def solve_for(static_items):
        static = dict(static_items)
        return jax.jit(
            lambda pt: ba.solve(
                pt[0], iters=iters, cg_iters=cg, damping=1e-4, tables=pt[1],
                unroll=True, **static,
            )
        )

    solve = lambda pts: solve_for(tuple(sorted(pts[2].items())))(pts[:2])
    dt, last = timeit(solve, problems, reps=6)
    stats = last[2]
    return {
        "keyframes": n_kf,
        "landmarks": n_lm,
        "gn_iters_per_sec": iters / dt,
        "cg_iters_per_gn": cg,
        "cost_reduction": float(stats.initial_cost / jnp.maximum(stats.final_cost, 1e-9)),
    }


def config5_dist_ba(n_kf=10000, n_lm=5000):
    from aruco_slam_tpu.parallel import dist_ba, mesh as mesh_lib

    n_dev = len(jax.devices())
    problem, _, _ = graph_builder.synthetic_ba_problem(
        n_kf, n_lm, obs_per_kf=8, seed=0
    )
    out = {"keyframes": n_kf, "landmarks": n_lm, "devices": n_dev}
    # single-device timing at full size (packed fast path). iters=10
    # (rounds 1-3 used 5): the ~30 ms remote-TPU dispatch floor is fixed
    # per call, so more GN iterations per call measure the solver rather
    # than the tunnel (at iters=5 the floor alone is ~15% of the call).
    gn_iters = 10
    packed, tables, static = ba.prepare(problem)
    solve = jax.jit(
        lambda pt: ba.solve(
            pt[0], iters=gn_iters, cg_iters=50, damping=1e-4, tables=pt[1],
            unroll=True, **static
        )
    )
    dt, _ = timeit(solve, [(packed, tables)], reps=3)
    out["single_device_gn_iters_per_sec"] = gn_iters / dt
    out["per_gn_ms"] = round(dt / gn_iters * 1e3, 2)
    out["gn_iters_per_call"] = gn_iters
    if n_dev >= 2:
        sharded, _ = dist_ba.partition_problem(problem, n_dev)
        mesh = mesh_lib.make_mesh(n_dev, axis=dist_ba.AXIS)
        # same damping as the single-device leg — different LM conditioning
        # would make the two legs incomparable
        run = lambda: dist_ba.solve_dist(
            sharded, mesh, iters=5, cg_iters=50, damping=1e-4
        )
        poses, lms, hist = run()
        np.asarray(poses)  # true first-exec barrier (see timeit)
        t0 = time.perf_counter()
        poses, lms, hist = run()
        jax.block_until_ready(poses)
        dt_d = time.perf_counter() - t0
        out["sharded_gn_iters_per_sec"] = 5 / dt_d
        out["scaling_efficiency"] = (5 / dt_d) / (n_dev * (5 / dt))
    else:
        out["note"] = "single chip available; sharded path validated on 8-way CPU mesh in tests"
    return out


def main():
    # merge into the existing report so sections written by other
    # harnesses (benchmarks/scaling.py's `scaling`) survive a full re-run
    path0 = os.path.join(os.path.dirname(__file__), "results.json")
    results = {}
    if os.path.exists(path0):
        with open(path0) as f:
            results = json.load(f)
    results["device"] = str(jax.devices()[0])
    for name, fn in [
        ("config1_ekf_reference_arena", config1_reference_arena),
        ("config2_loop_100_markers", config2_loop_100),
        ("config3_batched_replay", config3_batched),
        ("config3b_image_level", config_image_level),
        ("config4_ba_1k_500", config4_ba),
        ("config5_dist_ba_10k_5k", config5_dist_ba),
    ]:
        t0 = time.time()
        try:
            results[name] = fn()
        except Exception as e:  # keep the report going
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        results[name]["wall_s"] = round(time.time() - t0, 1)
        print(name, json.dumps(results[name]), flush=True)
    path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
