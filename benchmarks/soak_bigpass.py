#!/usr/bin/env python
"""Soak test for 2^20-path BVH passes (ADVICE r4 medium: the cap was
raised on only 3 clean bisection reps of a historically process-poisoning
sporadic failure; "substantially more soak data" was the ask).

Renders back-to-back 2^20-path room passes (the exact shape the opt-in
config.BVH_PASS_CAP = 1<<20 fast path uses), varying the sample index so
every pass traces fresh paths, and logs success/failure counts +
latencies. Run in its OWN process (a failure historically poisons the
client). Appends the tally to benchmarks/results_r5.json.

Usage: python benchmarks/soak_bigpass.py [--minutes 30]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    args = ap.parse_args()

    from take_tpu.config import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from take_tpu.render import _render_pass_jit
    from take_tpu.scene.parse_xml import parse_scene_file
    from take_tpu.scene.types import RenderOptions

    scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
    W = scene.meta.camera.width
    N = 1 << 20
    pix = jnp.arange(N, dtype=jnp.int32)
    options = RenderOptions(spp=1, max_depth=6, seed=0)

    ok, fail = 0, 0
    lat = []
    errs = []
    t_end = time.time() + args.minutes * 60
    s = 0
    while time.time() < t_end:
        t0 = time.time()
        try:
            out = _render_pass_jit(
                scene, options, pix, jnp.int32(s), W, 1
            )
            float(jnp.sum(out))  # force (block_until_ready is a no-op)
            ok += 1
            lat.append(time.time() - t0)
        except jax.errors.JaxRuntimeError as e:
            fail += 1
            errs.append(f"s={s}: {str(e)[:120]}")
            print(f"FAIL at sample {s}: {str(e)[:120]}", flush=True)
            time.sleep(60)
        s += 1
        if ok % 50 == 0 and lat:
            print(f"{ok} ok / {fail} fail; last {lat[-1]:.2f}s "
                  f"median {sorted(lat)[len(lat)//2]:.2f}s", flush=True)

    rec = {
        "passes_ok": ok,
        "passes_failed": fail,
        "paths_per_pass": N,
        "median_pass_s": round(sorted(lat)[len(lat) // 2], 2) if lat else None,
        "min_pass_s": round(min(lat), 2) if lat else None,
        "max_pass_s": round(max(lat), 2) if lat else None,
        "errors": errs[:5],
    }
    p = os.path.join(ROOT, "benchmarks", "results_r5.json")
    d = json.load(open(p)) if os.path.exists(p) else {}
    d["bigpass_soak"] = rec
    json.dump(d, open(p, "w"), indent=1)
    print(json.dumps(rec))
    return 0 if fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
