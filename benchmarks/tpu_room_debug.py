#!/usr/bin/env python
"""Isolate the sporadic room-render InvalidArgument: compile and execute
phases separated, with in-process cooldown retries to learn whether a failed
execute poisons the client or heals after a backoff."""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from take_tpu.config import enable_compile_cache

    enable_compile_cache()
    from take_tpu.render import _render_pass_jit, render_pass
    from take_tpu.scene.parse_xml import parse_scene_file
    from take_tpu.scene.types import RenderOptions

    scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
    opts = RenderOptions(spp=1, max_depth=6, seed=0)
    W = 1920
    pix = jnp.arange(0, 137 * W, dtype=jnp.int32)  # 263k paths

    # phase 1: explicit AOT compile
    t0 = time.time()
    try:
        lowered = _render_pass_jit.lower(
            scene, opts, pix, jnp.int32(0), W, 1
        )
        print(f"lowered in {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        compiled = lowered.compile()
        print(f"compiled in {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print("COMPILE FAIL", type(e).__name__, str(e)[:300], flush=True)
        return 1

    # phase 2: repeated execution with cooldown retries on failure
    fails = 0
    for i in range(12):
        t0 = time.time()
        try:
            out = jax.block_until_ready(
                compiled(scene, pix, jnp.int32(i % 4))
            )
            print(f"exec {i}: OK {time.time()-t0:.1f}s "
                  f"mean={float(out.mean()):.4f}", flush=True)
        except Exception as e:
            fails += 1
            print(f"exec {i}: FAIL {type(e).__name__} {str(e)[:160]}",
                  flush=True)
            if fails > 4:
                break
            print("cooldown 180s...", flush=True)
            time.sleep(180)
    return 0


if __name__ == "__main__":
    sys.exit(main())
