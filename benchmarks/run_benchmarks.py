#!/usr/bin/env python
"""Benchmark harness: the five BASELINE configs + throughput report.

Usage: python benchmarks/run_benchmarks.py [--quick] [--json OUT]

Runs on whatever backend JAX selects (the real TPU chip in this
environment). --quick reduces resolution/spp for smoke runs.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scenes"))
sys.path.insert(0, ROOT)  # `python benchmarks/run_benchmarks.py` from anywhere

CONFIGS = [
    # (name, scene, res_override, spp, max_depth) — the five BASELINE.json
    # configs at their full spec (room at its 1024 spp)
    ("cbox_256_16spp", "cbox/cbox.xml", 256, 16, 4),
    ("textured_512_64spp", "textured/textured.xml", 512, 64, 6),
    ("mis_512_128spp", "mis/mis.xml", 512, 128, 6),
    ("ibl_1024_256spp", "ibl/ibl.xml", 1024, 256, 6),
    ("room_1080p_1024spp", "room/room.xml", None, 1024, 6),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from generate import ensure_assets

    ensure_assets()

    import jax

    from take_tpu.config import enable_compile_cache

    enable_compile_cache()

    from take_tpu.core.camera import Camera
    from take_tpu.render import render_image
    from take_tpu.io.exr import write_exr
    from take_tpu.scene.parse_xml import parse_scene_file
    from take_tpu.scene.types import RenderOptions

    print(f"backend: {jax.devices()}")
    results = {}
    outdir = os.path.join(ROOT, "benchmarks", "out")
    os.makedirs(outdir, exist_ok=True)

    for name, rel, res, spp, depth in CONFIGS:
        if args.only and args.only not in name:
            continue
        scene = parse_scene_file(os.path.join(ROOT, "scenes", rel))
        cam = scene.meta.camera
        if args.quick:
            res = min(res or 256, 128)
            spp = min(spp, 8)
        if res is not None:
            scene = dataclasses.replace(
                scene,
                meta=dataclasses.replace(
                    scene.meta,
                    camera=Camera(
                        res, res, cam.lookfrom, cam.lookat, cam.up, cam.vfov
                    ),
                ),
            )
            W = H = res
        else:
            W, H = cam.width, cam.height
        options = RenderOptions(spp=spp, max_depth=depth, seed=0)

        # warm-up / compile with 1 spp
        render_image(scene, dataclasses.replace(options, spp=1))
        t0 = time.time()
        img = render_image(scene, options)
        dt = time.time() - t0

        n_paths = W * H * spp
        rays = n_paths * (1 + 2 * (depth + 1))
        results[name] = {
            "resolution": [W, H],
            "spp": spp,
            "max_depth": depth,
            "seconds": round(dt, 3),
            "Mpaths_per_sec": round(n_paths / dt / 1e6, 3),
            "Mrays_per_sec": round(rays / dt / 1e6, 3),
            "mean_radiance": [round(float(c), 5) for c in img.mean(axis=(0, 1))],
        }
        write_exr(os.path.join(outdir, f"{name}.exr"), img)
        print(name, json.dumps(results[name]))

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
