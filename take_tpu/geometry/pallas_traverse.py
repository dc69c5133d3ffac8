"""Pallas packet BVH traversal (TPU kernel).

Design: *packet* (block-coherent) traversal — the classic SIMD technique
re-mapped to TPU strengths. Each grid cell owns a block of B rays:

  * the node table + reordered triangle operands live wholly in VMEM (they
    fit for production interiors: ~1k nodes + ~100k tris = a few MB),
  * the traversal stack is SCALAR and shared per block: one node pops per
    iteration and its WIDTH child boxes are slab-tested against ALL B rays
    at once — [W, B] vector ops with the ray axis on lanes,
  * a child is pushed if ANY ray in the block hits it; leaves run a dense
    MXU Möller–Trumbore over their contiguous triangle run (the BVH build
    reorders triangles, so the kernel contains zero gathers),
  * per-ray best (t, u, v, prim) accumulates in the while-loop carry.

Packets are coherent for primary rays; bounce batches lose coherence
(future: per-bounce ray binning). The jnp while_loop traversal
(traverse.py) remains the fallback for scenes larger than VMEM.

Data layout (from scene/build.py + geometry/bvh.py):
  node boxes transposed to [3, M*W]; child/count as [1, M*W] int32;
  triangle affine operands axis-major [4, 3T] / [3, 3T].
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from take_tpu.geometry.bvh import LEAF_SIZE, WIDTH

BLOCK = 256  # rays per packet
STACK = 64

_BIG = 3.4e38


def prep_tables(scene):
    """Kernel-layout views of the BVH tables (pure reshapes, jit-cacheable)."""
    bvh = scene.bvh
    M = bvh.node_child.shape[0]
    nmin = bvh.node_min.transpose(2, 0, 1).reshape(3, M * WIDTH)
    nmax = bvh.node_max.transpose(2, 0, 1).reshape(3, M * WIDTH)
    child = bvh.node_child.reshape(1, M * WIDTH)
    count = bvh.node_count.reshape(1, M * WIDTH)
    return nmin, nmax, child, count


def _kernel(
    nmin_ref,  # [3, MW]
    nmax_ref,  # [3, MW]
    child_ref,  # [1, MW] int32
    count_ref,  # [1, MW] int32
    tri_o_ref,  # [4, 3T]
    tri_d_ref,  # [3, 3T]
    ro_ref,  # [1, 3, B]
    rd_ref,  # [1, 3, B]
    tmin_ref,  # [1, 1, B]
    tmax_ref,  # [1, 1, B]
    t_out,  # [1, 1, B]
    u_out,
    v_out,
    prim_out,  # [1, 1, B] int32
    stack_ref,  # SMEM [STACK] int32 scratch — the shared packet stack
):
    B = ro_ref.shape[2]
    Tpad = tri_d_ref.shape[1] // 3

    rox = ro_ref[0, 0:1, :]  # [1, B]
    roy = ro_ref[0, 1:2, :]
    roz = ro_ref[0, 2:3, :]
    rdx = rd_ref[0, 0:1, :]
    rdy = rd_ref[0, 1:2, :]
    rdz = rd_ref[0, 2:3, :]
    inv_x = 1.0 / jnp.where(jnp.abs(rdx) < 1e-20, 1e-20, rdx)
    inv_y = 1.0 / jnp.where(jnp.abs(rdy) < 1e-20, 1e-20, rdy)
    inv_z = 1.0 / jnp.where(jnp.abs(rdz) < 1e-20, 1e-20, rdz)
    tmin = tmin_ref[0, :, :]  # [1, B]
    oh = jnp.concatenate([rox, roy, roz, jnp.ones((1, B))], axis=0)  # [4, B]
    rdm = jnp.concatenate([rdx, rdy, rdz], axis=0)  # [3, B]

    def leaf_sweep(start, cnt, best):
        """Dense Möller–Trumbore: [LEAF_SIZE] tris x [B] rays on the MXU."""
        t_best, u_best, v_best, p_best = best
        o_u = tri_o_ref[:, pl.ds(0 * Tpad + start, LEAF_SIZE)]  # [4, L]
        o_v = tri_o_ref[:, pl.ds(1 * Tpad + start, LEAF_SIZE)]
        o_w = tri_o_ref[:, pl.ds(2 * Tpad + start, LEAF_SIZE)]
        d_u = tri_d_ref[:, pl.ds(0 * Tpad + start, LEAF_SIZE)]  # [3, L]
        d_v = tri_d_ref[:, pl.ds(1 * Tpad + start, LEAF_SIZE)]
        d_w = tri_d_ref[:, pl.ds(2 * Tpad + start, LEAF_SIZE)]

        # HIGHEST: Mosaic's default f32 dot is a single bf16 pass (~1e-3 rel
        # error, measured) — unusable for world-space intersection.
        hi = jax.lax.Precision.HIGHEST
        su = jnp.dot(o_u.T, oh, preferred_element_type=jnp.float32,
                     precision=hi)  # [L, B]
        sv = jnp.dot(o_v.T, oh, preferred_element_type=jnp.float32,
                     precision=hi)
        sw = jnp.dot(o_w.T, oh, preferred_element_type=jnp.float32,
                     precision=hi)
        du = jnp.dot(d_u.T, rdm, preferred_element_type=jnp.float32,
                     precision=hi)
        dv = jnp.dot(d_v.T, rdm, preferred_element_type=jnp.float32,
                     precision=hi)
        dw = jnp.dot(d_w.T, rdm, preferred_element_type=jnp.float32,
                     precision=hi)

        parallel = jnp.abs(dw) < 1e-12
        inv_dw = 1.0 / jnp.where(parallel, 1.0, dw)
        t = -sw * inv_dw  # [L, B]
        u = su + t * du
        v = sv + t * dv
        lane = jax.lax.broadcasted_iota(jnp.int32, (LEAF_SIZE, B), 0)
        ok = (
            (~parallel)
            & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= tmin) & (t < t_best)
            & (lane < cnt)
        )
        t_m = jnp.where(ok, t, _BIG)
        best_l = jnp.argmin(t_m, axis=0)  # [B]
        t_new = jnp.min(t_m, axis=0)[None, :]  # [1, B]
        onehot = (lane == best_l[None, :]).astype(jnp.float32)
        u_new = jnp.sum(u * onehot, axis=0)[None, :]
        v_new = jnp.sum(v * onehot, axis=0)[None, :]
        better = t_new < t_best
        return (
            jnp.where(better, t_new, t_best),
            jnp.where(better, u_new, u_best),
            jnp.where(better, v_new, v_best),
            jnp.where(
                better, (start + best_l[None, :]).astype(jnp.int32), p_best
            ),
        )

    def cond(state):
        sp, *_ = state
        return sp > 0

    def body(state):
        sp, t_best, u_best, v_best, p_best = state
        node = stack_ref[sp - 1]  # scalar SMEM read at dynamic index
        sp = sp - 1

        base = node * WIDTH
        cmin_x = nmin_ref[0:1, pl.ds(base, WIDTH)]  # [1, W]
        cmin_y = nmin_ref[1:2, pl.ds(base, WIDTH)]
        cmin_z = nmin_ref[2:3, pl.ds(base, WIDTH)]
        cmax_x = nmax_ref[0:1, pl.ds(base, WIDTH)]
        cmax_y = nmax_ref[1:2, pl.ds(base, WIDTH)]
        cmax_z = nmax_ref[2:3, pl.ds(base, WIDTH)]

        def slab(cmin, cmax, ro_c, inv_c):
            t0 = (cmin.T - ro_c) * inv_c  # [W, B]
            t1 = (cmax.T - ro_c) * inv_c
            return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

        lo_x, hi_x = slab(cmin_x, cmax_x, rox, inv_x)
        lo_y, hi_y = slab(cmin_y, cmax_y, roy, inv_y)
        lo_z, hi_z = slab(cmin_z, cmax_z, roz, inv_z)
        tlo = jnp.maximum(jnp.maximum(lo_x, lo_y), lo_z)
        thi = jnp.minimum(jnp.minimum(hi_x, hi_y), hi_z)
        hit = (tlo <= thi) & (thi >= tmin) & (tlo <= t_best)  # [W, B]
        any_hit_v = jnp.any(hit, axis=1, keepdims=True)  # [W, 1]

        best = (t_best, u_best, v_best, p_best)
        # Python-unrolled over the WIDTH child slots: all indices static
        # (Mosaic has no dynamic_slice on values).
        for w in range(WIDTH):
            c = child_ref[0, base + w]
            cnt = count_ref[0, base + w]
            do = any_hit_v[w, 0]
            push_w = do & (c >= 0)
            leaf_w = do & (c < 0) & (cnt > 0)

            # masked scalar push: the slot above the top is free space, so
            # an un-pushed write just rewrites garbage with garbage
            slot = jnp.minimum(sp, STACK - 1)
            cur = stack_ref[slot]
            stack_ref[slot] = jnp.where(push_w, c, cur)
            sp = sp + push_w.astype(jnp.int32)

            best = jax.lax.cond(
                leaf_w,
                lambda b, c=c, cnt=cnt: leaf_sweep(-(c + 1), cnt, b),
                lambda b: b,
                best,
            )
        return (sp,) + best

    state = (
        jnp.int32(1),
        jnp.full((1, B), _BIG),
        jnp.zeros((1, B)),
        jnp.zeros((1, B)),
        jnp.full((1, B), -1, jnp.int32),
    )
    stack_ref[0] = 0  # root
    state = jax.lax.while_loop(cond, body, state)
    _, t_best, u_best, v_best, p_best = state
    ok = t_best <= tmax_ref[0, :, :]
    t_out[0, :, :] = jnp.where(ok, t_best, _BIG)
    u_out[0, :, :] = u_best
    v_out[0, :, :] = v_best
    prim_out[0, :, :] = jnp.where(ok, p_best, -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def packet_traverse(nmin, nmax, child, count, tri_o, tri_d, ro, rd, tmin, tmax,
                    interpret: bool = False):
    """Traverse rays [N, 3] against the VMEM-resident wide BVH.

    Returns (t [N], u [N], v [N], prim [N]); t == 3.4e38 marks a miss.
    N must be a multiple of BLOCK (caller pads).
    """
    N = ro.shape[0]
    n_blocks = N // BLOCK

    ro_t = ro.T.reshape(3, n_blocks, BLOCK).transpose(1, 0, 2)  # [nb, 3, B]
    rd_t = rd.T.reshape(3, n_blocks, BLOCK).transpose(1, 0, 2)
    tmin_t = tmin.reshape(n_blocks, 1, BLOCK)
    tmax_t = tmax.reshape(n_blocks, 1, BLOCK)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    per_block = lambda: pl.BlockSpec(
        (1, ro_t.shape[1], BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    per_block1 = lambda: pl.BlockSpec(
        (1, 1, BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    t, u, v, prim = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            full(nmin.shape), full(nmax.shape),
            full(child.shape), full(count.shape),
            full(tri_o.shape), full(tri_d.shape),
            per_block(), per_block(), per_block1(), per_block1(),
        ],
        out_specs=[per_block1(), per_block1(), per_block1(), per_block1()],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, 1, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, BLOCK), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        interpret=interpret,
    )(nmin, nmax, child, count, tri_o, tri_d, ro_t, rd_t, tmin_t, tmax_t)

    return t.reshape(N), u.reshape(N), v.reshape(N), prim.reshape(N)
