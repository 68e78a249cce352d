"""Checkpoint / resume (L4) — the reference has none: its state lives only
in RAM and the learned map dies with the process (SURVEY.md section 5.4).

Two formats:
- **orbax** (preferred) for pytree checkpoints of any estimator state
  (EKF state, BA problem/solution) — async-capable, multi-host aware;
- **npz fallback** with identical semantics for minimal environments.

Plus the learned-map exporter: the EKF / BA landmark estimates serialized
in the reference's ``map.txt`` schema (map/map.txt:1 header) so ATE tooling
can diff estimated vs ground-truth maps directly.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from aruco_slam_tpu.io import map_io


def save_pytree(path: str, tree) -> None:
    """Save any pytree of arrays. Uses orbax when available, else npz."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:  # pragma: no cover - fallback path
        _save_npz(path + ".npz", tree)
        return
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, like):
    """Load a pytree saved by :func:`save_pytree`; ``like`` provides the
    structure (an example pytree with matching shapes/dtypes)."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:  # pragma: no cover
        return _load_npz(path + ".npz", like)
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like)


def _save_npz(path: str, tree) -> None:
    leaves, _ = jax.tree.flatten(tree)
    np.savez_compressed(path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def _load_npz(path: str, like):
    leaves, treedef = jax.tree.flatten(like)
    with np.load(path) as f:
        new = [f[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new)


def export_learned_map(
    path: str,
    landmarks,
    ids,
    active,
    marker_length: float = 0.27,
    z: float = 0.3,
) -> map_io.MarkerMap:
    """Write the estimated landmark map in the reference map.txt schema.

    ``landmarks [L, 3]`` planar (x, y, face-normal yaw), ``ids [L]``,
    ``active [L]`` — i.e. the output of ``models.ekf.get_map`` or a BA
    solve. Round-trips through ``map_io.load_map``."""
    from aruco_slam_tpu.sim.synthetic import planar_to_map

    landmarks = np.asarray(landmarks)
    ids = np.asarray(ids)
    active = np.asarray(active).astype(bool)
    m = planar_to_map(
        landmarks[active], ids=ids[active], marker_length=marker_length, z=z
    )
    map_io.save_map(path, m)
    return m
