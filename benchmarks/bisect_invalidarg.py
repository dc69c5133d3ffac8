#!/usr/bin/env python
"""Bisect the sporadic `INVALID_ARGUMENT: TPU backend error` on ~1M-path
BVH passes (VERDICT r3 #8; the mitigation is the 2^18-path cap +
block/retry in render.py).

Each (pass size x repetition) probe runs in its OWN subprocess: the
failure historically poisons the client process and can wedge the tunnel,
so isolation is the only way to attribute failures to a configuration.
Run AFTER other TPU work — a wedge can take minutes to recover.

Usage: python benchmarks/bisect_invalidarg.py [--sizes 18,19,20] [--reps 3]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time
sys.path.insert(0, {root!r})
import numpy as np
import jax, jax.numpy as jnp
from take_tpu.config import enable_compile_cache
enable_compile_cache()
from take_tpu.render import render_pass
from take_tpu.scene.parse_xml import parse_scene_file
from take_tpu.scene.types import RenderOptions

scene = parse_scene_file(os.path.join({root!r}, 'scenes/room/room.xml'))
W = scene.meta.camera.width
n = 1 << {log2n}
opts = RenderOptions(spp=1, max_depth=6, seed=0,
                     max_rays_per_pass=n)
pix = jnp.arange(n, dtype=jnp.int32) % (W * scene.meta.camera.height)
for r in range({reps}):
    t0 = time.time()
    out = np.asarray(render_pass(scene, opts, pix, jnp.int32(r), W, 1))
    print(f'PASS {{r}} ok {{time.time()-t0:.1f}}s mean={{out.mean():.4f}}',
          flush=True)
print('WORKER_OK', flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="18,19,20")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    # render.py caps BVH passes at 2^18: bypass the cap for the probe by
    # monkeypatching via env? render_image applies the cap, render_pass
    # does NOT (it renders whatever pixel batch it is given) — so the
    # worker drives render_pass directly at the probe size.
    results = {}
    for log2n in [int(x) for x in args.sizes.split(",")]:
        code = WORKER.format(root=ROOT, log2n=log2n, reps=args.reps)
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=1200,
            )
            ok = "WORKER_OK" in out.stdout
            tail = (out.stdout + out.stderr)[-400:]
        except subprocess.TimeoutExpired:
            ok, tail = False, "TIMEOUT (possible tunnel wedge)"
        results[f"2^{log2n}"] = {
            "ok": ok, "seconds": round(time.time() - t0, 1),
            "tail": tail if not ok else tail.splitlines()[-2:],
        }
        print(f"2^{log2n}: {'OK' if ok else 'FAIL'} "
              f"({results[f'2^{log2n}']['seconds']}s)", flush=True)
        if not ok:
            print(tail, flush=True)
            time.sleep(180)  # cooldown before the next probe
    print(json.dumps({k: v["ok"] for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
