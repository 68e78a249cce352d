"""Probe: Schur matvec with Apl stored lanes-trailing [3, 3, N] vs the
AoS [N, 3, 3] form (round 3).

[N, 3, 3] f32 tile-pads (3, 3) -> (8, 128): 327 MB per pass at N=80k, and
the matvec reads Apl twice per CG iteration. The slab form is 3*8*N*4 =
7.7 MB per pass; only the landmark bucket reduction and the u[obs_lm]
gather stay row-major (one [N, 3] transpose pair at the boundary).
Unlike the failed full-SoA rewrite (benchmarks/_ba_soa_solve.py: op-count
explosion), everything else stays AoS.
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from aruco_slam_tpu.models import ba, graph_builder

problem, _, _ = graph_builder.synthetic_ba_problem(10000, 5000, obs_per_kf=8, seed=0)
packed, tables, static = ba.prepare(problem)
O, chain = static["kf_width"], static["odo_chain"]
K, L = 10000, 5000
N = K * O

lin = jax.jit(
    lambda: ba._linearize(packed, packed.poses, packed.landmarks, 1e-4,
                          tables, O, chain)
)()
np.asarray(lin["bp"])
apl33 = jnp.transpose(lin["Apl"], (1, 2, 0))  # [3, 3, N]


def matvec_aos(v):
    return ba._schur_matvec(lin, packed, v, tables, O, chain)


def _hpp_part(v):
    out = (lin["Hpp_diag"] @ v[..., None])[..., 0]
    ci = (lin["Hij"] @ v[1:][..., None])[..., 0]
    cj = (jnp.swapaxes(lin["Hij"], -1, -2) @ v[:-1][..., None])[..., 0]
    return out + ba._chain_pad_i(ci) + ba._chain_pad_j(cj)


def matvec_slab(v):
    out = _hpp_part(v)
    vo = jnp.broadcast_to(v.T[:, :, None], (3, K, O)).reshape(3, N)
    ts = jnp.sum(apl33 * vo[:, None, :], axis=0)          # [3, N] = Apl^T v
    t_lm = ba._seg_sum_lm(ts.T, packed.obs_lm, L, tables)  # [L, 3]
    u = (lin["Hll_inv"] @ t_lm[..., None])[..., 0]
    us = u[packed.obs_lm].T                                # [3, N]
    back_s = jnp.sum(apl33 * us[None, :, :], axis=1)       # [3, N] = Apl u
    kf = back_s.reshape(3, K, O).sum(-1).T                 # [K, 3]
    return out - kf


def matvec_slab_lanegather(v):
    """Variant: bucket reduction gathers lanes of the [3, N] slab directly
    (no [N, 3] transpose pair)."""
    out = _hpp_part(v)
    vo = jnp.broadcast_to(v.T[:, :, None], (3, K, O)).reshape(3, N)
    ts = jnp.sum(apl33 * vo[:, None, :], axis=0)
    padded = jnp.concatenate([ts, jnp.zeros((3, 1), ts.dtype)], axis=1)
    # two-level tuple entries (round 4+) -> combine chunk partials so the
    # class output is [n_c] rows and lm_rank indexing stays aligned
    parts = []
    for t in tables.lm_bucket_tabs:
        if isinstance(t, tuple):
            chunk_tab, comb_tab = t
            partial = padded[:, chunk_tab].sum(axis=-1)  # [3, n_runs]
            pp = jnp.concatenate(
                [partial, jnp.zeros((3, 1), partial.dtype)], axis=1
            )
            parts.append(pp[:, comb_tab].sum(axis=-1))
        else:
            parts.append(padded[:, t].sum(axis=-1))
    t_lm = jnp.concatenate(parts, axis=1)[:, tables.lm_rank].T  # [L, 3]
    u = (lin["Hll_inv"] @ t_lm[..., None])[..., 0]
    us = u[packed.obs_lm].T
    back_s = jnp.sum(apl33 * us[None, :, :], axis=1)
    kf = back_s.reshape(3, K, O).sum(-1).T
    return out - kf


R = 20


def make(f):
    @jax.jit
    def prog(v0):
        def step(v, _):
            return f(v) * 1e-3 + v, None
        return jax.lax.scan(step, v0, None, length=R)[0]
    return prog


@jax.jit
def null_prog(x):
    return x + 1.0


def timeit(prog, x0):
    out = prog(x0)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(prog(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts)


v0 = jnp.asarray(np.random.RandomState(0).randn(K, 3).astype(np.float32))
floor = timeit(null_prog, jnp.zeros((4, 4), jnp.float32))
print("floor %.2f ms" % (floor * 1e3))
a = np.asarray(matvec_aos(v0))
for f, name in [(matvec_aos, "aos"), (matvec_slab, "slab"),
                (matvec_slab_lanegather, "slab_lanegather")]:
    t = timeit(make(f), v0)
    b = np.asarray(f(v0))
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    print("%-16s %8.1f us/matvec   max rel diff vs aos %.2e"
          % (name, (t - floor) / R * 1e6, rel))
