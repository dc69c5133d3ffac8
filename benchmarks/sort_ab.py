#!/usr/bin/env python
"""A/B: counting-sort vs argsort binning permutation (TPU).

Micro (captured wave: permutation construction + apply) and end-to-end
(room d6 pass). Decides config.SORT_MODE's default."""

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
    from take_tpu import config
    from take_tpu.geometry.traverse import _coherence_perm
    from take_tpu.render import render_pass
    from take_tpu.scene.parse_xml import parse_scene_file
    from take_tpu.scene.types import RenderOptions

    scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
    W = scene.meta.camera.width
    waves = np.load("/tmp/room_waves.npz")
    N = waves["b2_ro"].shape[0]
    ro = jnp.asarray(waves["b2_ro"])
    rd = jnp.asarray(waves["b2_rd"])

    def force(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                             .astype(jnp.float32)))

    def bench(label, fn, reps=3):
        force(fn())
        t0 = time.time()
        for _ in range(reps):
            force(fn())
        dt = (time.time() - t0) / reps
        print(f"{label:44s} {dt*1e3:9.1f} ms", flush=True)
        return dt

    pix = jnp.arange(1 << 18, dtype=jnp.int32)
    o6 = RenderOptions(spp=1, max_depth=6, seed=0)
    for mode in ["argsort", "counting"]:
        config.SORT_MODE = mode
        jax.clear_caches()

        @jax.jit
        def perm_and_apply(ro, rd):
            perm, inv = _coherence_perm(scene, ro, rd)
            return ro[perm][inv].sum()  # build + apply + invert

        bench(f"perm build+apply+invert [{mode}]",
              lambda: perm_and_apply(ro, rd))
        bench(f"room d6 full pass      [{mode}]", lambda: render_pass(
            scene, o6, pix, jnp.int32(0), W, 1))
    config.SORT_MODE = "argsort"
    return 0


if __name__ == "__main__":
    sys.exit(main())
