#!/usr/bin/env python
"""Scaling-efficiency harness on the virtual 8-device CPU mesh.

Prints one JSON line: {"efficiency_8dev": E, "t_1dev": ..., "t_8dev": ...}.

What this measures — and why it is iso-work, not weak scaling: the virtual
mesh fakes DEVICES, not compute (8 "devices" share this host's fixed CPU
cores), so growing work 8x must take ~8x wall clock regardless of how good
the sharding is. The honest number a fake mesh can produce is the GSPMD
partitioning overhead: the SAME total frame rendered on a 1-device mesh vs
sharded over an 8-device mesh. E = t_1dev / t_8dev; E ~= 1.0 means XLA
partitioned the path axis with no extra collectives/copies (the forward
pass has none by design — rays never talk to each other), which is the
property that makes per-chip weak scaling on real hardware ride at the
north star's >=85%. Real multi-host execution goes through the same
render_pass via parallel/distributed.py (tests/test_multihost.py runs an
actual 2-process cluster).
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/take_tpu_jax_cache")

    from take_tpu.parallel.sharding import make_mesh, render_image_sharded
    from take_tpu.scene.types import RenderOptions

    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from scenes import cornell_box

    scene = cornell_box(128, 128).build()
    options = RenderOptions(spp=8, max_depth=3, seed=0)

    def timed(n_dev):
        mesh = make_mesh(n_dev)
        render_image_sharded(scene, options, mesh)  # warmup/compile
        t0 = time.time()
        img = render_image_sharded(scene, options, mesh)
        return time.time() - t0, img

    t1, img1 = timed(1)
    t8, img8 = timed(8)
    assert (img1 == img8).all(), "sharded render not bit-identical"

    print(
        json.dumps(
            {
                "efficiency_8dev": round(t1 / t8, 4),
                "t_1dev": round(t1, 3),
                "t_8dev": round(t8, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
