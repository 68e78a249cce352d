"""Re-measure individual run_all configs (after code changes) and merge
into benchmarks/results.json. Usage: python benchmarks/rerun_configs.py
config1_ekf_reference_arena config3b_image_level ..."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import run_all

LEGS = {
    "config1_ekf_reference_arena": run_all.config1_reference_arena,
    "config2_loop_100_markers": run_all.config2_loop_100,
    "config3_batched_replay": run_all.config3_batched,
    "config3b_image_level": run_all.config_image_level,
    "config4_ba_1k_500": run_all.config4_ba,
    "config5_dist_ba_10k_5k": run_all.config5_dist_ba,
}

if __name__ == "__main__":
    path = os.path.join(os.path.dirname(__file__), "results.json")
    with open(path) as f:
        results = json.load(f)
    for name in sys.argv[1:]:
        t0 = time.time()
        try:
            results[name] = LEGS[name]()
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        results[name]["wall_s"] = round(time.time() - t0, 1)
        print(name, json.dumps(results[name]), flush=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", path)
