"""Vector math primitives on batched [..., 3] arrays.

Everything operates on trailing-dimension-3 arrays so it vmaps/shards freely
over arbitrary leading (ray-queue) axes. Counterpart of the reference's
scalar Vector3 ops (vector.h) re-expressed as vectorized jnp.
"""

import jax.numpy as jnp

C_PI = 3.14159265358979323846
C_INVPI = 1.0 / C_PI
C_TWOPI = 2.0 * C_PI
C_INVTWOPI = 1.0 / C_TWOPI
C_FOURPI = 4.0 * C_PI
C_INVFOURPI = 1.0 / C_FOURPI


def dot(a, b):
    """Batched dot product over the trailing axis, keeps no dims."""
    return jnp.sum(a * b, axis=-1)


def dot_k(a, b):
    """Batched dot product, keepdims=True (for broadcasting against vectors)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def length_squared(a):
    return jnp.sum(a * a, axis=-1)


def normalize(a, eps=0.0):
    """Normalize over trailing axis. With eps>0, guards zero vectors.

    Grad-safe at a == 0: sqrt's derivative at 0 is infinite, and
    jnp.maximum routes a ZERO cotangent into it — 0 * inf = NaN — so the
    sqrt argument is floored with a where (which fully disconnects the
    dead branch) instead. Primal values are unchanged: for eps == 0 a
    zero vector still yields 0/0 = NaN in the PRIMAL exactly as before
    (callers that can see zero vectors must pass eps)."""
    n2 = jnp.sum(a * a, axis=-1, keepdims=True)
    if eps:
        pos = n2 > eps
        n2 = jnp.where(pos, n2, eps)
    return a / jnp.sqrt(n2)


def luminance(rgb):
    """Rec.709 luminance (vector.h:309-311)."""
    return (
        rgb[..., 0] * 0.212671 + rgb[..., 1] * 0.715160 + rgb[..., 2] * 0.072169
    )


def to_world(n, v):
    """Frisvad branchless ONB: map local vector v into the frame around normal n.

    Matches the reference `to_world` (vector.h:314-326), including the
    n.z < -1+1e-6 singular branch, but expressed with jnp.where so it is
    branch-free across a batch.

    Args:
        n: [..., 3] unit normals (frame z-axis).
        v: [..., 3] local-space vectors.
    Returns:
        [..., 3] world-space vectors.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    singular = nz < (-1.0 + 1e-6)
    # Regular branch. Guard the 1/(1+nz) against the singular lanes so we
    # never produce inf that would poison the where (grad-safety).
    a = 1.0 / jnp.where(singular, 1.0, 1.0 + nz)
    b = -nx * ny * a
    x_reg = jnp.stack([1.0 - nx * nx * a, b, -nx], axis=-1)
    y_reg = jnp.stack([b, 1.0 - ny * ny * a, -ny], axis=-1)
    x_sing = jnp.broadcast_to(jnp.array([0.0, -1.0, 0.0], n.dtype), n.shape)
    y_sing = jnp.broadcast_to(jnp.array([-1.0, 0.0, 0.0], n.dtype), n.shape)
    s = singular[..., None]
    x = jnp.where(s, x_sing, x_reg)
    y = jnp.where(s, y_sing, y_reg)
    return x * v[..., 0:1] + y * v[..., 1:2] + n * v[..., 2:3]


def reflect(dir_in, n):
    """Mirror direction of `dir_in` (pointing away from surface) about n."""
    return -dir_in + 2.0 * dot_k(dir_in, n) * n


def face_forward(n, ref):
    """Flip n to lie in the hemisphere of `ref` (dot(n, ref) >= 0)."""
    return jnp.where(dot_k(n, ref) < 0.0, -n, n)


def srgb_to_linear(c):
    """sRGB electro-optical transfer, matching parse_scene.cpp:31-40."""
    c = jnp.asarray(c)
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def safe_norm(x, axis=-1):
    """Euclidean norm with a ZERO gradient at x == 0.

    jnp.linalg.norm's VJP is x / |x| — 0/0 = NaN at the origin. Degenerate
    lanes (dead paths, a light sample coinciding with the shading point)
    legitimately hit exactly 0 and are masked downstream, but the NaN
    poisons reverse-mode anyway (round-4 fix: Disney roughness gradients).
    Primal values are bitwise identical to jnp.linalg.norm."""
    sq = jnp.sum(x * x, axis=axis)
    pos = sq > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)


def safe_div(a, b, default=0.0):
    """a / b with b==0 lanes returning `default`; grad-safe (no inf in where)."""
    zero = b == 0.0
    denom = jnp.where(zero, 1.0, b)
    return jnp.where(zero, default, a / denom)
