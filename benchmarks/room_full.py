#!/usr/bin/env python
"""Room at its full BASELINE spec: 1920x1080, 1024 spp, max_depth 6.

Resumable long render (BASELINE config[4]; the reference renders this in
one multi-hour CPU run, render.cpp:52-82). Structure:

  * banded passes of 2^18 paths (the reliable size for BVH scenes through
    the packet kernel — render.py:118-127),
  * float64 HOST accumulation: device passes accumulate <= CHUNK samples
    in f32, the host adds exactly (1024-sample f32 sums would cost ~3
    decimal digits),
  * atomic checkpoint every ~32 samples: counter-based RNG makes a resumed
    render bit-equal to an uninterrupted one,
  * per-pass retry with cooldown for the sporadic TPU-runtime failure.

Writes the EXR + a parity block vs the reference-binary golden and appends
to benchmarks/results_r4.json.
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

CKPT = "/tmp/room_full_acc.npz"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=1024)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--checkpoint", default=CKPT)
    ap.add_argument("--out", default=os.path.join(
        ROOT, "benchmarks", "out", "room_1080p_1024spp.exr"))
    ap.add_argument("--finalize", action="store_true", help=(
        "write the EXR + stats from the current checkpoint at whatever "
        "sample count it holds (no rendering)"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from take_tpu.config import enable_compile_cache

    enable_compile_cache()
    from take_tpu.io.exr import read_exr, write_exr
    from take_tpu.render import render_pass
    from take_tpu.scene.parse_xml import parse_scene_file
    from take_tpu.scene.types import RenderOptions

    scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
    cam = scene.meta.camera
    W, H = cam.width, cam.height
    n_pix = W * H
    band = 1 << 18
    bands = [(lo, min(lo + band, n_pix)) for lo in range(0, n_pix, band)]
    options = RenderOptions(spp=args.spp, max_depth=args.max_depth, seed=0)

    acc = np.zeros((n_pix, 3), np.float64)
    s_done = 0
    if os.path.exists(args.checkpoint):
        z = np.load(args.checkpoint)
        acc = z["acc"].astype(np.float64)
        s_done = int(z["spp_done"])
        print(f"resumed at sample {s_done}", flush=True)

    if args.finalize:
        args.spp = s_done  # normalize/emit at the achieved sample count

    t_start = time.time()
    for s in range(s_done, args.spp):
        t0 = time.time()
        for (lo, hi) in bands:
            pix = jnp.arange(lo, hi, dtype=jnp.int32)
            if hi - lo < band:  # single compiled shape: wrap-pad
                pix = jnp.concatenate(
                    [pix, jnp.zeros(band - (hi - lo), jnp.int32)])
            for attempt in range(4):
                try:
                    out = np.asarray(render_pass(
                        scene, options, pix, jnp.int32(s), W, 1))
                    break
                except jax.errors.JaxRuntimeError as e:
                    print(f"pass fail s={s} band={lo}: "
                          f"{str(e)[:100]}", flush=True)
                    if attempt == 3:
                        raise
                    time.sleep(120 * (attempt + 1))
            acc[lo:hi] += out[: hi - lo].astype(np.float64)
        if (s + 1) % 32 == 0 or s + 1 == args.spp:
            tmp = args.checkpoint + ".tmp"
            np.savez_compressed(tmp, acc=acc.astype(np.float64),
                                spp_done=np.int64(s + 1))
            os.replace(tmp + ".npz", args.checkpoint)
            el = time.time() - t_start
            done = s + 1 - s_done
            eta = el / done * (args.spp - s - 1)
            print(f"sample {s+1}/{args.spp}  {time.time()-t0:.1f}s/spp  "
                  f"eta {eta/60:.0f} min", flush=True)

    img = (acc / args.spp).reshape(H, W, 3)[::-1].astype(np.float32)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    write_exr(args.out, img)
    total = time.time() - t_start
    n_paths = n_pix * (args.spp - s_done)
    rays = n_paths * (1 + 2 * (args.max_depth + 1))
    rec = {
        "config": f"room_1080p_{args.spp}spp_d{args.max_depth}",
        "seconds_this_run": round(total, 1),
        "samples_this_run": args.spp - s_done,
        "Mrays_per_sec": round(rays / total / 1e6, 3),
        "mean_radiance": [round(float(c), 5)
                          for c in img.mean(axis=(0, 1))],
    }
    # prefer the 128-spp reference golden (round 5) over the 16-spp one
    golden = "/tmp/take_golden_room_d6_128spp.exr"
    if not os.path.exists(golden):
        golden = "/tmp/take_golden_room_d6.exr"
    if os.path.exists(golden):
        ref = read_exr(golden)
        if ref.shape == img.shape:
            nb, b = 16, H // 16
            r = ref[: nb * b, : nb * b].reshape(nb, b, nb, b, 3).mean(
                (1, 3)).sum(-1)
            o = img[: nb * b, : nb * b].reshape(nb, b, nb, b, 3).mean(
                (1, 3)).sum(-1)
            rel = np.abs(o - r) / (r + 0.05)
            rec[f"parity_vs_reference_{os.path.basename(golden)}"] = {
                "mean_rel_err": round(float(
                    np.abs(img.mean((0, 1)) - ref.mean((0, 1))).sum()
                    / (ref.mean((0, 1)).sum() + 1e-12)), 5),
                "block_rel_median": round(float(np.median(rel)), 5),
                "block_rel_p99": round(float(np.quantile(rel, 0.99)), 5),
            }
    res_path = os.path.join(ROOT, "benchmarks", "results_r4.json")
    existing = {}
    if os.path.exists(res_path):
        existing = json.load(open(res_path))
    existing[rec["config"]] = rec
    json.dump(existing, open(res_path, "w"), indent=1)
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
