"""One rank of the weak-scaling measurement (benchmarks/scaling.py).

Renders a frame whose pixel count scales with the process count through the
REAL multi-host path (jax.distributed + global mesh + allgather); rank 0
prints the steady-state wall time.

Usage: python scaling_worker.py <proc_id> <n_procs> <port>
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main():
    proc_id, n_procs, port = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/take_tpu_jax_cache")

    from take_tpu.parallel.distributed import (
        init_distributed,
        render_image_multihost,
    )

    if n_procs > 1:
        init_distributed(f"localhost:{port}", n_procs, proc_id)

    from take_tpu.scene.types import RenderOptions
    from scenes import cornell_box

    # weak scaling: pixel rows scale with the process count
    scene = cornell_box(256, 256 * n_procs).build()
    options = RenderOptions(spp=8, max_depth=3, seed=0)

    render_image_multihost(scene, options)  # warmup/compile
    stats = {}
    t0 = time.time()
    render_image_multihost(scene, options, stats=stats)
    dt = time.time() - t0
    if proc_id == 0:
        print(f"SCALING n={n_procs} t={dt:.3f} "
              f"pass={stats['pass_seconds']:.3f} "
              f"asm={stats['assemble_seconds']:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
