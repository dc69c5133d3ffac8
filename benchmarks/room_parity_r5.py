#!/usr/bin/env python
"""Round-5 room parity: the committed full-spec 1024-spp render vs the
128-spp reference-binary golden (VERDICT r4 next #5 — the previous
flagship band was measured against a 16-spp golden two rounds running).

Reads benchmarks/out/room_1080p_1024spp.exr (bit-derived from the
resumable checkpoint at spp_done=1024) and the cached golden; writes the
room entry into benchmarks/results_r5_configs.json.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from take_tpu.io.exr import read_exr

    ours_path = os.path.join(
        ROOT, "benchmarks", "out", "room_1080p_1024spp.exr")
    golden = "/tmp/take_golden_room_d6_128spp.exr"
    img = read_exr(ours_path)
    ref = read_exr(golden)
    assert img.shape == ref.shape == (1080, 1920, 3), (img.shape, ref.shape)

    H = img.shape[0]
    nb, b = 16, H // 16
    r = ref[: nb * b, : nb * b].reshape(nb, b, nb, b, 3).mean((1, 3)).sum(-1)
    o = img[: nb * b, : nb * b].reshape(nb, b, nb, b, 3).mean((1, 3)).sum(-1)
    rel = np.abs(o - r) / (r + 0.05)
    rec = {
        "resolution": [1920, 1080],
        "spp": 1024,
        "max_depth": 6,
        "golden": f"{os.path.basename(golden)} (reference binary, 128 spp)",
        "mean_radiance": [round(float(c), 5) for c in img.mean((0, 1))],
        "parity_vs_reference_128spp": {
            "mean_rel_err": round(float(
                np.abs(img.mean((0, 1)) - ref.mean((0, 1))).sum()
                / (ref.mean((0, 1)).sum() + 1e-12)), 5),
            "block_rel_median": round(float(np.median(rel)), 5),
            "block_rel_p99": round(float(np.quantile(rel, 0.99)), 5),
        },
    }
    res_path = os.path.join(ROOT, "benchmarks", "results_r5_configs.json")
    d = json.load(open(res_path)) if os.path.exists(res_path) else {}
    d["room_1080p_1024spp"] = rec
    json.dump(d, open(res_path, "w"), indent=2)
    print(json.dumps(rec, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
