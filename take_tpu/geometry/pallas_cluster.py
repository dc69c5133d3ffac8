"""Streaming cluster cull+sweep BVH-free traversal (TPU Pallas).

This is the beyond-VMEM traversal path: it matches the reference's
any-scene-size capability (bvh.cpp:86-109) with a design that maps onto the
TPU's strengths instead of its weaknesses. Per-node pointer chasing (packet
kernel, pallas_traverse.py) serializes on a scalar stack and requires the
whole scene resident in VMEM; here traversal is recast as three dense,
regular stages with *zero* in-kernel control flow:

  1. CULL kernel — every block of B rays slab-tests ALL cluster AABBs
     (clusters = consecutive runs of CLUSTER_K Morton-ordered triangles, so
     they are spatially tight). Output: a dense [n_blocks, C] hit mask.
     Pure [C, B] VPU work, boxes resident in VMEM (32 B/cluster).
  2. XLA glue — cumsum-compaction of the mask into a block-major
     (block, cluster) pair list. The pair count P feeds a *dynamic* Pallas
     grid, so no padding work is executed and no pairs are ever dropped.
  3. SWEEP kernel — grid over pairs; each step streams one cluster's
     triangle operands HBM->VMEM (Pallas pipeline double-buffers the DMA
     under compute) and runs a dense [K, B] Möller–Trumbore in f32 VPU
     component form. Consecutive pairs share a ray block, so the per-block
     best-hit accumulator lives in the revisited VMEM output block.

Triangle data therefore lives in HBM always — scene size is bounded by HBM,
not VMEM. Ray coherence (which controls how close the block's cluster
*union* is to the per-ray average) is restored for bounce waves by a stable
sort on (origin-Morton, direction-octant) keys; per-ray results are a pure
function of the ray, so sorting never changes the image.

Determinism: the winner is the lowest-t hit with ties broken toward the
lowest primitive index (per-cluster argmin takes the first row; the
cross-cluster merge is strict `<` over ascending cluster ids), so results
are independent of block grouping, sorting, and device count.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from take_tpu.geometry.bvh import CLUSTER_K

BLOCK = 512  # rays per block (4 lane-tiles)
_CULL_CHUNK = 2048  # max cluster rows slab-tested per cull grid step
# Pairs per sweep round: the pair metadata is scalar-prefetched into SMEM
# (~1MB total), so each pallas_call sees a fixed-size window; rounds loop
# under lax.fori_loop until the dynamic pair count is drained. 32k pairs
# x 2 int32 arrays = 256KB SMEM.
_PAIRS_PER_ROUND = 32768
_BIG = 3.4e38
_DW_EPS = 1e-12  # parallel-ray reject, matches intersect.py


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _ray_components(rays_ref):
    """Unpack a [1, 8, B] ray block into [1, B] component rows."""
    ox = rays_ref[0, 0:1, :]
    oy = rays_ref[0, 1:2, :]
    oz = rays_ref[0, 2:3, :]
    dx = rays_ref[0, 3:4, :]
    dy = rays_ref[0, 4:5, :]
    dz = rays_ref[0, 5:6, :]
    tmin = rays_ref[0, 6:7, :]
    tmax = rays_ref[0, 7:8, :]
    return ox, oy, oz, dx, dy, dz, tmin, tmax


def _cull_kernel(rays_ref, boxes_ref, mask_ref):
    """Slab-test one ray block against one chunk of cluster AABBs.

    rays [1, 8, B]; boxes [CC, 8] = (min.xyz, max.xyz, 0, 0);
    mask out [1, CC, 1] = 1.0 where ANY ray in the block hits the box.
    Inclusive-range semantics match bbox.h:18-32 / traverse.py::_slab_test.
    """
    ox, oy, oz, dx, dy, dz, tmin, tmax = _ray_components(rays_ref)
    ix = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)

    def axis(lo_col, hi_col, o, inv):
        a = (lo_col - o) * inv  # [CC, B]
        b = (hi_col - o) * inv
        return jnp.minimum(a, b), jnp.maximum(a, b)

    l0, h0 = axis(boxes_ref[:, 0:1], boxes_ref[:, 3:4], ox, ix)
    l1, h1 = axis(boxes_ref[:, 1:2], boxes_ref[:, 4:5], oy, iy)
    l2, h2 = axis(boxes_ref[:, 2:3], boxes_ref[:, 5:6], oz, iz)
    tlo = jnp.maximum(jnp.maximum(l0, l1), l2)
    thi = jnp.minimum(jnp.minimum(h0, h1), h2)
    hit = (tlo <= thi) & (thi >= tmin) & (tlo <= tmax)
    mask_ref[0, :, :] = jnp.any(hit, axis=1, keepdims=True).astype(jnp.float32)


def _mt_sweep(tris_ref, ox, oy, oz, dx, dy, dz, tmin, tmax):
    """Dense [K, B] Möller–Trumbore over one cluster's affine operands.

    VPU component form (no matmuls: the contraction depth is 4, which would
    run the MXU at ~3% utilization; broadcast-FMA chains are ~10x faster
    here). Exact f32 — identical semantics to intersect.py::_tri_uvt.
    Returns (t, u, v, ok).
    """
    blk = tris_ref[:]  # [K, 24]
    su = blk[:, 0:1] * ox + blk[:, 1:2] * oy + blk[:, 2:3] * oz + blk[:, 3:4]
    sv = blk[:, 4:5] * ox + blk[:, 5:6] * oy + blk[:, 6:7] * oz + blk[:, 7:8]
    sw = blk[:, 8:9] * ox + blk[:, 9:10] * oy + blk[:, 10:11] * oz + blk[:, 11:12]
    du = blk[:, 12:13] * dx + blk[:, 13:14] * dy + blk[:, 14:15] * dz
    dv = blk[:, 15:16] * dx + blk[:, 16:17] * dy + blk[:, 17:18] * dz
    dw = blk[:, 18:19] * dx + blk[:, 19:20] * dy + blk[:, 20:21] * dz

    parallel = jnp.abs(dw) < _DW_EPS
    inv_dw = 1.0 / jnp.where(parallel, 1.0, dw)
    t = -sw * inv_dw
    u = su + t * du
    v = sv + t * dv
    ok = (
        (~parallel)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= tmin)
        & (t <= tmax)
    )
    return t, u, v, ok


def _sweep_kernel(
    bidf_ref, cid_ref, rays_ref, tris_ref, t_ref, u_ref, v_ref, p_ref
):
    """Closest-hit sweep of one (ray block, cluster) pair.

    bidf packs (block_id << 1) | first_visit. Outputs are revisited
    accumulators: pairs are block-major, so all pairs of a block hit the
    same VMEM-resident output block; `first` initializes.
    """
    i = pl.program_id(0)
    ox, oy, oz, dx, dy, dz, tmin, tmax = _ray_components(rays_ref)

    @pl.when((bidf_ref[i] & 1) == 1)
    def _():
        t_ref[0, :, :] = jnp.full(tmin.shape, _BIG)
        u_ref[0, :, :] = jnp.zeros(tmin.shape)
        v_ref[0, :, :] = jnp.zeros(tmin.shape)
        p_ref[0, :, :] = jnp.full(tmin.shape, -1, jnp.int32)

    t, u, v, ok = _mt_sweep(tris_ref, ox, oy, oz, dx, dy, dz, tmin, tmax)
    tcur = t_ref[0, :, :]
    tm = jnp.where(ok & (t < tcur), t, _BIG)
    best = jnp.argmin(tm, axis=0)  # [B] lowest row wins ties (lowest prim)
    tnew = jnp.min(tm, axis=0)[None, :]  # [1, B]
    lane = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
    onehot = (lane == best[None, :]).astype(tm.dtype)
    unew = jnp.sum(u * onehot, axis=0)[None, :]
    vnew = jnp.sum(v * onehot, axis=0)[None, :]
    better = tnew < tcur
    prim = cid_ref[i] * CLUSTER_K + best[None, :]
    t_ref[0, :, :] = jnp.where(better, tnew, tcur)
    u_ref[0, :, :] = jnp.where(better, unew, u_ref[0, :, :])
    v_ref[0, :, :] = jnp.where(better, vnew, v_ref[0, :, :])
    p_ref[0, :, :] = jnp.where(better, prim, p_ref[0, :, :])


def _occluded_kernel(bidf_ref, cid_ref, rays_ref, tris_ref, occ_ref):
    """Any-hit sweep: no best tracking, no u/v/prim epilogue — the TRUE
    any-hit kernel the reference lacks (scene_occluded is a full closest
    hit, scene.cpp:49-63 ⚠)."""
    i = pl.program_id(0)
    ox, oy, oz, dx, dy, dz, tmin, tmax = _ray_components(rays_ref)

    @pl.when((bidf_ref[i] & 1) == 1)
    def _():
        occ_ref[0, :, :] = jnp.zeros(tmin.shape, jnp.int32)

    _, _, _, ok = _mt_sweep(tris_ref, ox, oy, oz, dx, dy, dz, tmin, tmax)
    any_k = jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)
    occ_ref[0, :, :] = occ_ref[0, :, :] | any_k


# ---------------------------------------------------------------------------
# host-level glue (all inside jit; shapes static, pair count dynamic)
# ---------------------------------------------------------------------------


def _ray_blocks(ro, rd, tmin, tmax):
    """Pack padded ray SoA [Np] into [nb, 8, BLOCK] component blocks."""
    Np = ro.shape[0]
    nb = Np // BLOCK
    rows = jnp.concatenate(
        [ro.T, rd.T, tmin[None, :], tmax[None, :]], axis=0
    )  # [8, Np]
    return rows.reshape(8, nb, BLOCK).transpose(1, 0, 2)


def _cull(rays, cl_aabb, interpret):
    """[nb, Cp] f32 block-level cluster hit mask."""
    nb = rays.shape[0]
    Cp = cl_aabb.shape[0]
    cc = Cp if Cp <= _CULL_CHUNK else _CULL_CHUNK
    if Cp % cc:
        pad = -(-Cp // cc) * cc - Cp
        filler = jnp.tile(
            jnp.asarray([[3e38, 3e38, 3e38, -3e38, -3e38, -3e38, 0, 0]],
                        cl_aabb.dtype),
            (pad, 1),
        )
        cl_aabb = jnp.concatenate([cl_aabb, filler], axis=0)
        Cp = cl_aabb.shape[0]
    mask = pl.pallas_call(
        _cull_kernel,
        grid=(nb, Cp // cc),
        in_specs=[
            pl.BlockSpec((1, 8, BLOCK), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((cc, 8), lambda b, c: (c, 0)),
        ],
        out_specs=pl.BlockSpec((1, cc, 1), lambda b, c: (b, c, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, Cp, 1), jnp.float32),
        # [cc, B] f32 temporaries overflow the default 16MB scoped-VMEM
        # budget; the chip has ~128MB (measured on v5e)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        interpret=interpret,
    )(rays, cl_aabb)
    return mask[:, :, 0]


def _pairs_from_mask(mask):
    """Compact a [nb, Cp] hit mask into a block-major pair list.

    Returns (bidf, cid, n_pairs): bidf packs (block_id << 1) | first_visit.
    Arrays are sized nb*Cp + _PAIRS_PER_ROUND (dense bound + slack so every
    round's dynamic_slice stays in range); only the first n_pairs entries
    are real, and only those grid steps execute (dynamic grid).
    """
    nb, Cp = mask.shape
    maskb = mask.reshape(-1) > 0.5
    pos = jnp.cumsum(maskb.astype(jnp.int32)) - 1
    n_pairs = pos[-1] + 1
    flat = jnp.arange(nb * Cp, dtype=jnp.int32)
    psrc = (
        jnp.zeros(nb * Cp + _PAIRS_PER_ROUND, jnp.int32)
        .at[jnp.where(maskb, pos, nb * Cp + _PAIRS_PER_ROUND)]
        .set(flat, mode="drop")
    )
    bid = psrc // Cp
    cid = psrc % Cp
    first = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (bid[1:] != bid[:-1]).astype(jnp.int32)]
    )
    return (bid << 1) | first, cid, jnp.maximum(n_pairs, 1)


def _sweep_round(rays, tri_sweep, bidf, cid, n_pairs, any_hit, interpret):
    """One pallas_call over a window of at most _PAIRS_PER_ROUND pairs."""
    nb = rays.shape[0]
    if any_hit:
        kernel = _occluded_kernel
        out_shape = [jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.int32)]
    else:
        kernel = _sweep_kernel
        out_shape = [
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.int32),
        ]
    out_spec = pl.BlockSpec((1, 1, BLOCK), lambda i, b, c: (b[i] >> 1, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((1, 8, BLOCK), lambda i, b, c: (b[i] >> 1, 0, 0)),
            pl.BlockSpec((CLUSTER_K, 24), lambda i, b, c: (c[i], 0)),
        ],
        out_specs=[out_spec] * len(out_shape),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(bidf, cid, rays, tri_sweep)


def _sweep(rays, tri_sweep, bidf, cid, n_pairs, any_hit, interpret):
    """Drain the pair list in _PAIRS_PER_ROUND windows, merging per-round
    results. Rounds are needed because pair metadata is scalar-prefetched
    into SMEM (~1MB); a window of 32k pairs uses 256KB.

    Out-blocks a round never visits hold uninitialized memory, so merging
    is masked by the round's (contiguous, ascending) block coverage range.
    """
    nb = rays.shape[0]
    n_rounds = pl.cdiv(n_pairs, _PAIRS_PER_ROUND)
    blk_idx = jnp.arange(nb, dtype=jnp.int32)[:, None, None]  # [nb, 1, 1]

    if any_hit:
        init = (jnp.zeros((nb, 1, BLOCK), jnp.int32),)
    else:
        init = (
            jnp.full((nb, 1, BLOCK), _BIG, jnp.float32),
            jnp.zeros((nb, 1, BLOCK), jnp.float32),
            jnp.zeros((nb, 1, BLOCK), jnp.float32),
            jnp.full((nb, 1, BLOCK), -1, jnp.int32),
        )

    def round_body(r, outs):
        off = r * _PAIRS_PER_ROUND
        bidf_w = jax.lax.dynamic_slice(bidf, (off,), (_PAIRS_PER_ROUND,))
        cid_w = jax.lax.dynamic_slice(cid, (off,), (_PAIRS_PER_ROUND,))
        # the window starts a fresh accumulation for its first block
        bidf_w = bidf_w.at[0].set(bidf_w[0] | 1)
        g = jnp.minimum(n_pairs - off, _PAIRS_PER_ROUND)
        outs_r = _sweep_round(
            rays, tri_sweep, bidf_w, cid_w, g, any_hit, interpret
        )
        b_lo = bidf_w[0] >> 1
        b_hi = bidf[jnp.minimum(off + g - 1, bidf.shape[0] - 1)] >> 1
        covered = (blk_idx >= b_lo) & (blk_idx <= b_hi)
        if any_hit:
            return (jnp.where(covered, outs[0] | outs_r[0], outs[0]),)
        t, u, v, p = outs
        # strict <: equal-t hits from later rounds are later clusters,
        # i.e. higher prim ids — the earlier (lower) one wins, matching
        # the single-round tie-break
        better = covered & (outs_r[0] < t)
        return (
            jnp.where(better, outs_r[0], t),
            jnp.where(better, outs_r[1], u),
            jnp.where(better, outs_r[2], v),
            jnp.where(better, outs_r[3], p),
        )

    return jax.lax.fori_loop(0, n_rounds, round_body, init)


def _interleave6(x, y, z):
    """30-bit Morton interleave of three 6-bit ints (device-side)."""

    def spread(v):
        v = v & 0x3F
        v = (v | (v << 8)) & 0x0300F
        v = (v | (v << 4)) & 0x030C3
        v = (v | (v << 2)) & 0x09249
        return v

    return (spread(x) << 2) | (spread(y) << 1) | spread(z)


def _coherence_keys(ro, rd, cl_aabb, alive):
    """Stable-sort keys restoring packet coherence for bounce waves:
    direction octant in the low bits, origin Morton cell above. Dead/pad
    rays key to the max so they stay grouped at the tail."""
    lo = jnp.min(cl_aabb[:, 0:3], axis=0)
    hi = jnp.max(cl_aabb[:, 3:6], axis=0)
    ext = jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip((ro - lo) / ext * 64.0, 0.0, 63.0).astype(jnp.int32)
    morton = _interleave6(q[:, 0], q[:, 1], q[:, 2])
    octant = (
        ((rd[:, 0] < 0).astype(jnp.int32) << 2)
        | ((rd[:, 1] < 0).astype(jnp.int32) << 1)
        | (rd[:, 2] < 0).astype(jnp.int32)
    )
    key = (morton << 3) | octant
    return jnp.where(alive, key, jnp.int32(1 << 30))


@functools.partial(
    jax.jit, static_argnames=("any_hit", "sort_rays", "interpret")
)
def cluster_traverse(
    cl_aabb,
    tri_sweep,
    ro,
    rd,
    tmin,
    tmax,
    any_hit: bool = False,
    sort_rays: bool = True,
    interpret: bool = False,
):
    """Traverse rays against the clustered triangle soup.

    Args:
        cl_aabb: [Cp, 8] cluster AABB table (BVHArrays.cl_aabb).
        tri_sweep: [Cp*K, 24] row-major triangle affine operands
            (GeometryArrays.tri_sweep).
        ro, rd, tmin, tmax: padded ray SoA; N must be a multiple of BLOCK
            (callers pad with tmax < tmin rays).
    Returns:
        any_hit=False: (t, u, v, prim) [N]; prim == -1 marks a miss
            (t is _BIG there).
        any_hit=True: occluded bool [N].
    """
    N = ro.shape[0]
    if sort_rays:
        keys = _coherence_keys(ro, rd, cl_aabb, tmax >= tmin)
        _, perm = jax.lax.sort(
            (keys, jnp.arange(N, dtype=jnp.int32)), dimension=0,
            is_stable=True, num_keys=1,
        )
        ro, rd = ro[perm], rd[perm]
        tmin, tmax = tmin[perm], tmax[perm]

    rays = _ray_blocks(ro, rd, tmin, tmax)
    mask = _cull(rays, cl_aabb, interpret)
    bidf, cid, n_pairs = _pairs_from_mask(mask)
    outs = _sweep(rays, tri_sweep, bidf, cid, n_pairs, any_hit, interpret)

    def unblock(x):
        x = x[:, 0, :].reshape(N)
        if sort_rays:
            x = jnp.zeros_like(x).at[perm].set(x)
        return x

    if any_hit:
        return unblock(outs[0]) > 0
    t = unblock(outs[0])
    u = unblock(outs[1])
    v = unblock(outs[2])
    prim = unblock(outs[3])
    return t, u, v, prim
