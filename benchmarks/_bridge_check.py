"""Gap-bridging CCL variant: labels cross 1-px bg gaps; fg unchanged."""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/benchmarks")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import detector_parity_sweep as sw
import external_parity as ep
from aruco_slam_tpu.ops import detector
import cv2

def label_components_bridge(fg, rounds):
    h, w = fg.shape
    n = h * w
    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    big = jnp.int32(n)
    ri = jnp.arange(h)[:, None]; ci = jnp.arange(w)[None, :]
    def sh(x, dy, dx, fill):
        y = jnp.roll(x, (dy, dx), (0, 1))
        if dy > 0: y = jnp.where(ri < dy, fill, y)
        if dy < 0: y = jnp.where(ri >= h + dy, fill, y)
        if dx > 0: y = jnp.where(ci < dx, fill, y)
        if dx < 0: y = jnp.where(ci >= w + dx, fill, y)
        return y
    def neighbor_min(lab):
        lab_m = jnp.where(fg, lab, big)
        best = lab_m
        for dy in (-2, -1, 0, 1, 2):
            for dx in (-2, -1, 0, 1, 2):
                if dy == 0 and dx == 0: continue
                best = jnp.minimum(best, sh(lab_m, dy, dx, big))
        return jnp.where(fg, jnp.minimum(lab, best), lab)
    def seg_scan(lab, axis, reverse):
        v = jnp.where(fg, lab, big)
        # boundary only at 2+ consecutive bg pixels
        bg = ~fg
        bg2 = bg & sh(bg, -1 if axis == 0 else 0, -1 if axis == 1 else 0, True)
        f = bg2
        def comb(a, b):
            av, af = a; bv, bf = b
            return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf
        out, _ = jax.lax.associative_scan(comb, (v, f), axis=axis, reverse=reverse)
        return jnp.where(fg, jnp.minimum(lab, out), lab)
    def round_fn(_, lab):
        lab = neighbor_min(lab)
        lab = seg_scan(lab, 1, False); lab = seg_scan(lab, 1, True)
        lab = seg_scan(lab, 0, False); lab = seg_scan(lab, 0, True)
        return lab
    return jax.lax.fori_loop(0, rounds, round_fn, idx).reshape(-1)

# external check
detector.label_components = label_components_bridge
tot = hits = falses = 0; misses = []
for name, mk in ep.scene_defs():
    ep.RNG = np.random.default_rng(7)
    im, g2 = ep.render_scene(cv2, mk)
    o = set(ep.ours_detect(im, detector.DetectorConfig(use_pallas_ccl=False)))
    tot += len(g2); hits += len(o & set(g2)); falses += len(o - set(g2))
    misses += [(name, i) for i in set(g2) - o]
print(f"external with bridge: {hits}/{tot} false={falses} misses={misses}", flush=True)

# noise conditions on the main sweep
d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_ARUCO_ORIGINAL)
cv_det = cv2.aruco.ArucoDetector(d, cv2.aruco.DetectorParameters())
sc = sw.scenes()
sw.RNG = np.random.default_rng(42)
frames = {}
for cond_name, fn in sw.conditions():
    for name, img, ids in sc:
        frames[(cond_name, name)] = fn(img)
cfg = detector.DetectorConfig(use_pallas_ccl=False)
base = {}
for name, img, ids in sc:
    base[name] = (sw.ours_ids(img, cfg) & ids) | (sw.cv2_ids(frames[("clean", name)], cv_det) & ids)
for cond_name, _ in sw.conditions():
    tot = hits = cvh = fo = 0
    for name, img, ids in sc:
        det_set = base[name]
        deg = frames[(cond_name, name)]
        o = sw.ours_ids(deg, cfg)
        c = sw.cv2_ids(deg, cv_det) & ids
        tot += len(det_set); hits += len((o & ids) & det_set)
        cvh += len(c & det_set); fo += len(o - ids)
    print("  %-15s ours %2d/%d cv2 %2d/%d false %d%s"
          % (cond_name, hits, tot, cvh, tot, fo,
             "  <-- below cv2" if hits < cvh else ""), flush=True)
