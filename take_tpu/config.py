"""Global numeric configuration.

The reference uses `Real = double` and a fixed epsilon 1e-7 (take.h:27-30),
explicitly trading performance for not having to think about precision. TPUs
are float32-native, so we default to f32 and replace the fixed epsilon with a
distance/scale-aware ray offset policy (see `ray_epsilon`).
"""

import jax.numpy as jnp

# Default real dtype for all device arrays. Tests may use float64 on CPU by
# enabling jax_enable_x64 and passing dtype explicitly to builders.
real_dtype = jnp.float32

# Minimum parametric distance for rays, as used by the reference (take.h:30).
# Kept small: self-intersection in f32 is prevented by offsetting the ray
# ORIGIN (see integrator's offset_origin), not by inflating tmin — a fixed
# tmin cannot be right at every scene scale.
C_EPSILON = 1e-4

# Origin offset scale: spawn points move RAY_OFFSET_REL * (1 + |p|_inf) along
# the geometric normal. ~1000 f32 ulps — covers the accumulated error of
# intersection + position reconstruction at any scene scale.
RAY_OFFSET_REL = 1.2e-4

INF = float("inf")

# Fused Pallas brute-force intersection kernels (geometry/pallas_brute.py)
# for VMEM-resident scenes on the TPU backend. Trace-time switch: flip before
# the first jit trace (or clear jit caches) for it to take effect.
PALLAS_BRUTE = True

# Streaming group-sweep traversal (geometry/pallas_cluster.py) for BVH
# scenes on TPU: triangle tables stay in HBM, so any scene size works, and
# per-block work is bounded at cluster granularity (robust to
# direction-incoherent bounce waves, unlike the packet kernel). Trace-time
# switch like PALLAS_BRUTE.
PALLAS_CLUSTER = True

# Route VMEM-resident BVH scenes to the cluster pipeline too (testing /
# benchmarking aid; by default the packet kernel wins whenever it fits).
FORCE_CLUSTER = False

# Bin rays by (direction octant, origin Morton) before the Pallas traversal
# kernels (geometry/traverse.py::_coherence_perm): block coherence is what
# both kernels' work bounds depend on. Trace-time switch like PALLAS_BRUTE.
RAY_SORT = True

# Rays per packet for the packet traversal kernel (pallas_traverse.py).
# Smaller blocks tighten the any-ray-hit union on incoherent waves at the
# cost of more scalar stack work per ray.
PACKET_BLOCK = 256

# Extra per-axis direction Morton bits in the binning key (between the
# octant and the origin Morton; geometry/traverse.py::_coherence_perm).
# 0 = octant only.
SORT_DIR_BITS = 0

# Reuse the NEE shadow query's coherence permutation for the same
# bounce's closest-hit query (the origins are near-identical): halves the
# number of argsorts per pass. Measured round 5 on room d6: each
# _coherence_perm costs 26 ms at 2^18 rays, ~40% of the pass across 14
# queries; reuse traded a slightly degraded bounce-query octant for 7
# fewer sorts (A/B in BASELINE round-5 notes).
SORT_REUSE = True

# Include the 3-bit direction octant at the top of the binning key.
# Round-3 data says origin locality dominates (finer direction bits were
# NEGATIVE); False keys on origin Morton alone (experiment flag).
SORT_OCTANT = True

# Binning permutation construction. NEGATIVE RESULT (round 4,
# benchmarks/sort_ab.py): "counting" (stable counting sort by the top
# SORT_BITS) measured 55 ms vs argsort's 33 ms for build+apply+invert on
# the chip (the chunked cumsum/scatter lower poorly), AND the coarse
# 10-bit buckets lose the fine origin-Morton order inside blocks — room
# d6 pass 1584 ms vs 1002 ms. Full "argsort" stays the default; the
# counting path is kept property-tested for future revisits (more bits /
# a Pallas histogram would change both numbers).
SORT_MODE = "argsort"
SORT_BITS = 10

# Two-phase closest-hit for BVH scenes (geometry/traverse.py): phase 1 caps
# every ray at TWO_PHASE_FRAC * scene diagonal, then unresolved lanes are
# compacted and re-traced at full range. Estimator-exact. DEFAULT OFF since
# round 4: with correct device sync (block_until_ready is a no-op through
# the tunnel, so round-3 timings undercounted), the room d6 pass measures
# 1006 ms without it vs 1325 ms with it — the second kernel launch + extra
# argsort cost more than the tighter unions save (benchmarks/policy_bench).
TWO_PHASE = False
TWO_PHASE_FRAC = 0.06

# Lane capacity of the wavefront-refill driver (integrator/wavefront.py):
# dead lanes adopt unstarted paths, so a pass of P paths runs ~P*E[depth]/Q
# near-full iterations instead of max_depth full-width trips. Smaller waves
# raise the live fraction but add fixed per-iteration cost.
WAVE_SIZE = 1 << 16

# Cluster-sweep traversal kernel (geometry/pallas_sweep.py): tree-free
# cull+sweep over the 64-triangle Morton cluster table, VMEM-resident.
# NEGATIVE RESULT (round 4, benchmarks/sweep_bench): exact on-chip parity,
# but on room bounce waves it converges to the same ~0.5-1 us per
# block-divergent work unit as the packet kernel (166 ms vs packet's 94 ms
# on the b2 wave) — the per-sweep VPU volume floor, not the tree, is the
# bottleneck. Kept as a tested alternate backend; FORCE_SWEEP (the only
# switch — there is no separate enable flag) routes BVH scenes through it
# for experiments.
FORCE_SWEEP = False

# Per-pass path cap for BVH scenes in the render drivers. Rounds 2-3 saw
# sporadic TPU-runtime INVALID_ARGUMENT at ~1M-path packet passes that can
# poison the whole client process and wedge the axon tunnel for 30+ min;
# round 4's subprocess-isolated bisection could NOT reproduce it at
# 2^18/2^19/2^20 (benchmarks/bisect_invalidarg.py), but 3 clean reps of a
# sporadic failure are thin evidence (ADVICE r4), so the DEFAULT stays at
# the battle-tested 2^18 and the 2^20 fast path is an explicit opt-in for
# harnesses that can afford a crash (resumable/parity-optional runs set
# config.BVH_PASS_CAP = 1 << 20; room d6 measured 4.52 vs ~3.6 Mrays/s).
BVH_PASS_CAP = 1 << 18


def checks_enabled() -> bool:
    """Opt-in numeric guard (the functional-model analog of the reference's
    kept-on asserts, take.h:3-5): TAKE_TPU_CHECKS=1 makes the render driver
    validate every accumulated pass for NaN/Inf on the host and raise with
    the offending band. Off by default — the check syncs device->host per
    pass."""
    import os

    return os.environ.get("TAKE_TPU_CHECKS", "") == "1"


def enable_compile_cache(path="/tmp/take_tpu_jax_cache"):
    """Persistent XLA compile cache — renders recompile only on code change.
    Called by the CLI and bench entry points."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
