"""Round-5: on-device compile check of the closing-union candidate source
at every shape bucket. The FUSED union megakernel fails Mosaic
compilation at 1080x1920 (both label images + close scratch in VMEM at
once); detector._union_masks_and_labels stages past
_UNION_KERNEL_MAX_PIXELS (fused raw kernel + XLA close + SEEDED single
CCL kernel). This drives detect_markers end-to-end at each bucket."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aruco_slam_tpu_jax_cache")
import jax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
import numpy as np
import jax.numpy as jnp

from aruco_slam_tpu.ops import detector

rng = np.random.default_rng(0)
for (h, w) in ((480, 640), (720, 1280), (1080, 1920)):
    img = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.uint8))
    t0 = time.perf_counter()
    try:
        det = jax.jit(
            lambda im: detector.detect_markers(im, detector.DetectorConfig())
        )(img)
        jax.block_until_ready(det.valid)
        np.asarray(det.valid)
        print(f"{h}x{w}: OK ({time.perf_counter()-t0:.1f}s compile+run)",
              flush=True)
    except Exception as e:
        print(f"{h}x{w}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
