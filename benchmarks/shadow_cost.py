#!/usr/bin/env python
"""Occlusion-query cost share of a room pass (VERDICT r4 next #7).

Method: time a real 2^18-path room band pass three ways, forcing
materialization (block_until_ready is a no-op through the axon tunnel):

  a) production pass,
  b) occlusion stubbed to all-unoccluded (monkeypatched before trace;
     the difference a-b is what ALL shadow queries cost end-to-end,
     including their share of the coherence sort),
  c) closest-hit bounce queries ALSO see how much the sort costs:
     RAY_SORT off for (c) vs (a) is already recorded in BASELINE r4;
     here we only report (a), (b), and the occlusion share.

The estimator of (b) is WRONG (light leaks) — it exists purely to price
the stage. Own-process tool; one TPU client at a time.
"""

import dataclasses
import importlib
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def timed_pass(scene, options, pix, W, reps=3):
    import jax.numpy as jnp

    from take_tpu.render import _render_pass_jit

    key_options = dataclasses.replace(options, spp=1)
    out = _render_pass_jit(scene, key_options, pix, jnp.int32(0), W, 1)
    float(jnp.sum(out))  # force (compile + run)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = _render_pass_jit(scene, key_options, pix, jnp.int32(1), W, 1)
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from take_tpu.config import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from take_tpu.scene.parse_xml import parse_scene_file
    from take_tpu.scene.types import RenderOptions

    scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
    W = scene.meta.camera.width
    N = 1 << 18
    pix = jnp.arange(400 * W, 400 * W + N, dtype=jnp.int32)
    options = RenderOptions(spp=1, max_depth=6, seed=0)

    t_full = timed_pass(scene, options, pix, W)
    print(f"full pass:        {t_full*1e3:8.1f} ms", flush=True)

    # stub occlusion (trace-time patch; separate executable because the
    # traced program differs — clear caches to be explicit)
    from take_tpu.geometry import intersect as I
    import take_tpu.integrator.path_tracer as PT

    real_occluded = I.occluded

    def no_occ(scene, ro, rd, tmin, tmax):
        return jnp.zeros(ro.shape[0], bool)

    I.occluded = no_occ
    PT.occluded = no_occ  # path_tracer imported the symbol directly
    jax.clear_caches()
    try:
        t_noshadow = timed_pass(scene, options, pix, W)
    finally:
        I.occluded = real_occluded
        PT.occluded = real_occluded
        jax.clear_caches()
    print(f"no-shadow pass:   {t_noshadow*1e3:8.1f} ms", flush=True)

    share = 1.0 - t_noshadow / t_full
    rec = {
        "room_pass_ms": round(t_full * 1e3, 1),
        "room_pass_noshadow_ms": round(t_noshadow * 1e3, 1),
        "occlusion_share": round(share, 4),
    }
    import json

    res_path = os.path.join(ROOT, "benchmarks", "results_r5.json")
    existing = {}
    if os.path.exists(res_path):
        existing = json.load(open(res_path))
    existing["room_shadow_cost"] = rec
    json.dump(existing, open(res_path, "w"), indent=1)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
