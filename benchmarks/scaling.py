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


def _run(n_procs, independent=False):
    """n_procs ranks, one core each. independent=True launches n separate
    1-process renders simultaneously instead of one distributed cluster —
    the host-contention CONTROL: its slowdown is pure core/memory-bandwidth
    contention with zero distribution in the loop."""
    env = _env()
    procs = []
    for i in range(n_procs):
        port = _free_port() if (independent or i == 0) else port0
        if i == 0:
            port0 = port
        # EVERY rank is pinned to one core — including the 1-proc baseline,
        # otherwise XLA spreads it over all cores and the baseline is not
        # one core's throughput
        rank, world = (0, 1) if independent else (i, n_procs)
        cmd = [
            "taskset", "-c", str(i % os.cpu_count()),
            sys.executable, WORKER, str(rank), str(world), str(port),
        ]
        procs.append(
            subprocess.Popen(
                cmd, env=env, cwd=ROOT,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    t, t_pass, t_asm = None, None, None
    ts = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        for line in out.decode(errors="replace").splitlines():
            if line.startswith("SCALING"):
                ts.append(float(line.split("t=")[1].split()[0]))
                t_pass = float(line.split("pass=")[1].split()[0])
                t_asm = float(line.split("asm=")[1].split()[0])
        if p.returncode != 0:
            raise RuntimeError(out.decode(errors="replace")[-2000:])
    # independent mode: every proc reports (all are rank 0) — worst time
    # is the honest contention number
    t = max(ts)
    return t, t_pass, t_asm


def _calibration():
    """Weak scaling of a PURE elementwise chain (no renderer, no
    communication) through the same runtime: the measured ceiling of what
    ANY computation can score on this harness. Round-4 finding: XLA CPU
    executes per-device shards largely serially (~0.55 here on 2 cores),
    so renderer numbers below that ceiling measure the runtime, not the
    distribution design (the renderer's partitioned HLO has ZERO
    all-gathers and a 3 ms assemble)."""
    code = r"""
import os, sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P, Mesh
mesh2 = Mesh(np.array(jax.devices()), ("x",))
mesh1 = Mesh(np.array(jax.devices()[:1]), ("x",))
@jax.jit
def work(a):
    for _ in range(10):
        a = jnp.sin(a) * 1.0001 + jnp.cos(a * 0.5)
    return a
def run(mesh, n):
    sh = NamedSharding(mesh, P("x"))
    a = jax.device_put(jnp.ones((n, 64)), sh)
    float(jnp.sum(work(a)))
    t0 = time.time()
    for _ in range(3):
        float(jnp.sum(work(a)))
    return (time.time() - t0) / 3
t1 = run(mesh1, 1 << 16)
t2 = run(mesh2, 1 << 17)
print("CALIB", t1 / t2)
"""
    env = _env()
    flags = [f for f in env["XLA_FLAGS"].split()
             if "device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=2"])
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=ROOT,
                         capture_output=True, text=True, timeout=600)
    for line in out.stdout.splitlines():
        if line.startswith("CALIB"):
            return float(line.split()[1])
    return None


def _best(fn, reps=3):
    """Min wall time over reps: this 2-vCPU VM sees sporadic hypervisor
    scheduling stalls (measured round 5: the same configuration scored
    t_2proc 12.3 / 21.5 / 15.4 s across back-to-back runs on an idle
    host), and the synchronized cluster run is gang-scheduling sensitive —
    the LEAST-interfered rep is the honest capability number."""
    outs = [fn() for _ in range(reps)]
    return min(outs, key=lambda o: o[0])


def main():
    n = min(2, os.cpu_count())
    t1, p1, a1 = _best(lambda: _run(1))
    tn, pn, an = _best(lambda: _run(n))
    # contention control: n INDEPENDENT 1-proc renders, same core pinning,
    # zero distribution — bounds how much of the loss is the host itself
    tc, _, _ = _best(lambda: _run(n, independent=True))
    calib = _calibration()
    eff = t1 / tn
    eff_ctrl = t1 / tc
    print(
        json.dumps(
            {
                "weak_scaling_efficiency_2proc": round(eff, 4),
                "contention_control_efficiency": round(eff_ctrl, 4),
                "distribution_only_efficiency": round(tc / tn, 4),
                "calibration_elementwise_efficiency": (
                    round(calib, 4) if calib is not None else None),
                "t_1proc": round(t1, 3),
                f"t_{n}proc": round(tn, 3),
                f"t_{n}independent": round(tc, 3),
                "pass_seconds": pn,
                "assemble_seconds": an,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
