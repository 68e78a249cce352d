"""BA per-GN-step stage inventory at the config-5 shape (10k kf / 5k lm /
80k obs): measured cost per stage vs its HBM-bytes bound.

VERDICT round 3 weak #2: the claim "the per-GN fixed part is already
bandwidth-shaped" was asserted, not shown. This gives the BA step the same
treatment docs/PERFORMANCE.md item 17 gave the detector.

Methodology — two complementary measurements, both tunnel-immune:

1. IN-PROGRAM MARGINALS: the real ``ba.solve`` program is re-measured with
   one stage ablated (cg_iters=0 for the CG loop; history computed from
   the carried linearization for the cost pass; dl=0 for back-substitution)
   and the delta attributed to the stage. This captures materialization
   and layout costs exactly as the production program pays them.
2. STAGE-ALONE CHAINED PROBES: R applications of the stage fused into one
   dispatch (divides away the ~26 ms tunnel floor). The feedback sums
   EVERY output leaf — summing only one leaf lets XLA dead-code the other
   outputs, which silently under-reported linearize by 4x (this file's
   first revision did exactly that). Still optimistic where the real
   program must materialize an intermediate the probe can fuse away.

Writes a `ba_stage_inventory` section into benchmarks/results.json.
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache"
)
import jax

sys.path.insert(0, "/root/repo")
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from aruco_slam_tpu.models import ba, graph_builder

K, L, OBS = 10000, 5000, 8
problem, _, _ = graph_builder.synthetic_ba_problem(K, L, obs_per_kf=OBS, seed=0)
packed, tables, static = ba.prepare(problem)
O, ODO_CHAIN = static["kf_width"], static["odo_chain"]
N = K * O
prior_pose = packed.poses[0]

lin = jax.jit(
    lambda: ba._linearize(
        packed, packed.poses, packed.landmarks, 1e-4, tables, O, ODO_CHAIN
    )
)()
np.asarray(lin["bp"])  # first-exec barrier

R = 12  # chained applications per dispatch (heavy stages)
R_SMALL = 96  # sub-0.3 ms stages need more reps to clear tunnel jitter


def sum_all_leaves(out):
    return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(out))


def chain(f, reps=R):
    @jax.jit
    def prog(c0):
        def step(c, _):
            return sum_all_leaves(f(c)) * 1e-12 + c * 0.5 + 0.25, None

        return jax.lax.scan(step, c0, None, length=reps)[0]

    return prog


@jax.jit
def null_prog(x):
    return x + 1.0


def timeit(prog, x0, reps=5):
    out = prog(x0)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # true first-exec fetch
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(prog(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# ---- stage-alone definitions ----

def stage_linearize(c):
    return ba._linearize(
        packed, packed.poses * c, packed.landmarks, 1e-4, tables, O, ODO_CHAIN
    )


def stage_reduced_rhs(c):
    # perturb bl, not just bp: everything downstream of bl must recompute
    # per chained rep, else XLA hoists the gather chain out of the scan
    bp = lin["bp"] * c
    u = (lin["Hll_inv"] @ (lin["bl"] * c)[..., None])[..., 0]
    back = (lin["Apl"] @ u[packed.obs_lm][..., None])[..., 0]
    return bp - ba._kf_sum(back, packed.obs_kf, K, None, O)


def stage_matvec_chain(v0):
    def body(v, _):
        return ba._schur_matvec(lin, packed, v, tables, O, ODO_CHAIN) * 1e-3 + v, None

    return jax.lax.scan(body, v0, None, length=R)[0]


def stage_backsub(c):
    dp = lin["bp"] * c
    dp_obs = jnp.broadcast_to(dp[:, None, :], (K, O, 3)).reshape(-1, 3)
    t = (jnp.swapaxes(lin["Apl"], -1, -2) @ dp_obs[..., None])[..., 0]
    t_lm = ba._seg_sum_lm(t, packed.obs_lm, L, tables)
    return (lin["Hll_inv"] @ (lin["bl"] - t_lm)[..., None])[..., 0]


def stage_cost(c):
    return ba.cost(packed, packed.poses * c, packed.landmarks, prior_pose)[
        None
    ]


# ---- HBM byte accounting (minimum traffic, f32) ----
B = 4
# linearize: read obs_z/obs_w/valid/obs_lm + odo; write Hpp [K,9],
# Hll_inv [L,9], Apl [N,9], Hij [K,9], bp [K,3], bl [L,3]; the landmark
# bucket reductions re-read ~1.3x N rows of [N,9]+[N,3] (measured class
# padding at this degree distribution) after the producer writes them.
bytes_linearize = (
    N * (3 + 9 + 1 + 1) * B  # factor inputs
    + (K * 9 + L * 9 + N * 9 + (K - 1) * 9 + K * 3 + L * 3) * B  # outputs
    + int(1.3 * N * 12 * B) * 2  # bucket gather re-reads (All, bl terms)
)
bytes_reduced_rhs = (L * 12 + N * 3 + N * 9 + K * 3) * B
# matvec: Hpp_diag+Hij [2K,9] read; Apl read twice; two [N,3] gathers
# (bucketed t rows at ~1.3x padding, u[obs_lm]); v/out [K,3] streams.
bytes_matvec = (K * 18 + 2 * N * 9 + int(2.3 * N * 3) + 2 * K * 3) * B
bytes_backsub = (N * 9 + N * 3 + int(1.3 * N * 3) + L * 12 + L * 3) * B
bytes_cost = (N * (3 + 9 + 1) + (K - 1) * 12 + K * 3 + L * 3) * B

HBM_GBPS = 819.0  # v5e spec


def run():
    floor = timeit(null_prog, jnp.zeros((4, 4), jnp.float32))
    print(f"dispatch floor {floor*1e3:.2f} ms", flush=True)

    # ---- in-program marginals ----
    def solve_prog(cg_iters, iters=2):
        return jax.jit(
            lambda c, cg=cg_iters, it=iters: ba.solve(
                packed._replace(poses=packed.poses * c),
                iters=it, cg_iters=cg, damping=1e-4, tables=tables,
                kf_width=O, odo_chain=ODO_CHAIN,
            )[2].final_cost[None]
        )

    t_cg50 = (timeit(solve_prog(50), jnp.float32(1.0)) - floor) / 2
    t_cg0 = (timeit(solve_prog(0), jnp.float32(1.0)) - floor) / 2
    per_cg_iter = (t_cg50 - t_cg0) / 50
    print(
        f"solve/GN cg=50 {t_cg50*1e3:7.2f} ms | cg=0 {t_cg0*1e3:7.2f} ms "
        f"| marginal {per_cg_iter*1e6:6.1f} us/CG-iter",
        flush=True,
    )

    # ---- stage-alone chained probes ----
    rows = []
    stages = [
        ("linearize", chain(stage_linearize), jnp.float32(1.0),
         bytes_linearize, 1, R),
        ("reduced-rhs", chain(stage_reduced_rhs, R_SMALL), jnp.float32(1.0),
         bytes_reduced_rhs, 1, R_SMALL),
        ("schur-matvec", jax.jit(stage_matvec_chain),
         jnp.ones((K, 3), jnp.float32), bytes_matvec, 50, R),
        ("backsub", chain(stage_backsub, R_SMALL), jnp.float32(1.0),
         bytes_backsub, 1, R_SMALL),
        ("cost", chain(stage_cost, R_SMALL), jnp.float32(1.0), bytes_cost,
         1, R_SMALL),
    ]
    for name, prog, x0, nbytes, mult, reps in stages:
        t = (timeit(prog, x0) - floor) / reps
        bound_ms = nbytes / HBM_GBPS / 1e6
        rows.append(
            dict(
                stage=name,
                stage_alone_ms=round(t * 1e3, 3),
                hbm_bytes=nbytes,
                bandwidth_bound_ms=round(bound_ms, 4),
                x_over_bound=round(t * 1e3 / bound_ms, 1),
                per_gn_count=mult,
            )
        )
        print(
            f"{name:16s} {t*1e3:8.3f} ms  bound {bound_ms:7.4f} ms "
            f"({t*1e3/bound_ms:6.1f}x)",
            flush=True,
        )

    path = os.path.join(os.path.dirname(__file__), "results.json")
    results = json.load(open(path)) if os.path.exists(path) else {}
    results["ba_stage_inventory"] = dict(
        shape=dict(keyframes=K, landmarks=L, obs=N, kf_width=O),
        dispatch_floor_ms=round(floor * 1e3, 2),
        chained_reps=R,
        hbm_gbps_assumed=HBM_GBPS,
        in_program=dict(
            gn_step_cg50_ms=round(t_cg50 * 1e3, 2),
            gn_step_cg0_ms=round(t_cg0 * 1e3, 2),
            marginal_us_per_cg_iter=round(per_cg_iter * 1e6, 1),
        ),
        stages=rows,
        backend=jax.default_backend(),
    )
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    run()
