#!/usr/bin/env python
"""Weak-scaling efficiency of the REAL multi-host path on this host's cores.

Prints one JSON line: {"weak_scaling_efficiency_2proc": E, ...}.

Method: the 8-virtual-device trick fakes DEVICES, not compute (all shards
share this host's cores), so it can only measure thread thrash. What CAN be
measured honestly here is process-level weak scaling through the actual
distributed stack: N single-device JAX processes (jax.distributed cluster
over localhost, global mesh, allgather assembly — the same code path as a
TPU pod), each pinned to its own physical core with taskset, rendering a
frame whose pixel count scales with N. E = t(1 proc, W) / t(N procs, N*W);
ideal weak scaling keeps the wall time flat (E = 1).
"""

import json
import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "benchmarks", "scaling_worker.py")


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
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no backend init at import
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run(n_procs):
    port = _free_port()
    env = _env()
    procs = []
    for i in range(n_procs):
        # EVERY rank is pinned to one core — including the 1-proc baseline,
        # otherwise XLA spreads it over all cores and the baseline is not
        # one core's throughput
        cmd = [
            "taskset", "-c", str(i % os.cpu_count()),
            sys.executable, WORKER, str(i), str(n_procs), str(port),
        ]
        procs.append(
            subprocess.Popen(
                cmd, env=env, cwd=ROOT,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    t = None
    for p in procs:
        out, _ = p.communicate(timeout=900)
        for line in out.decode(errors="replace").splitlines():
            if line.startswith("SCALING"):
                t = float(line.split("t=")[1])
        if p.returncode != 0:
            raise RuntimeError(out.decode(errors="replace")[-2000:])
    return t


def main():
    n = min(2, os.cpu_count())
    t1 = _run(1)
    tn = _run(n)
    print(
        json.dumps(
            {
                "weak_scaling_efficiency_2proc": round(t1 / tn, 4),
                "t_1proc": round(t1, 3),
                f"t_{n}proc": round(tn, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
