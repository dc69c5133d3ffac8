"""Per-material reflectance texture evaluation (const or image slot).

Replicates the reference's bilinear sampler *exactly*, including its
wrap-column behavior: when x1 is the last texel, x2 wraps to 0 for the fetch
but the interpolation weights are computed with the wrapped coordinate, which
extrapolates rather than interpolates across the seam (texture.cpp:7-26).
Golden-image parity requires keeping this quirk.
"""

import jax.numpy as jnp

from take_tpu.scene.types import Scene, TEX_IMAGE


def _modulo1(x):
    """Positive fractional part, matching modulo(a, 1.0) in take.h:57-67."""
    r = jnp.mod(x, 1.0)
    return jnp.where(r < 0.0, r + 1.0, r)


def eval_reflectance_packed(scene: Scene, mat_params, uv, const_val):
    """Image-texture path of the reflectance slot, from packed material
    params [N, MATTR_DIM] (bsdf.make_shade_point). Only called when the
    scene has image textures; atlas fetches are genuine gathers."""
    from take_tpu.scene import types as ST

    tex_id = mat_params[:, ST.MATTR_TEX_IMAGE].astype(jnp.int32)
    scale = mat_params[:, ST.MATTR_UVSCALE : ST.MATTR_UVSCALE + 2]
    offset = mat_params[:, ST.MATTR_UVOFFSET : ST.MATTR_UVOFFSET + 2]
    kind = mat_params[:, ST.MATTR_TEX_KIND].astype(jnp.int32)
    return _bilinear_eval(scene, tex_id, scale, offset, kind, uv, const_val)


def _bilinear_eval(scene, tex_id, scale, offset, kind, uv, const_val):
    w = scene.textures.width[tex_id].astype(uv.dtype)  # [N]
    h = scene.textures.height[tex_id].astype(uv.dtype)

    x = w * _modulo1(scale[:, 0] * uv[:, 0] + offset[:, 0])
    y = h * _modulo1(scale[:, 1] * uv[:, 1] + offset[:, 1])

    x1 = jnp.floor(x)
    y1 = jnp.floor(y)
    x1i = x1.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    wi = w.astype(jnp.int32)
    hi = h.astype(jnp.int32)
    x2i = jnp.where(x1i + 1 == wi, 0, x1i + 1)  # wrapped fetch column
    y2i = jnp.where(y1i + 1 == hi, 0, y1i + 1)

    img = scene.textures.data  # [n, Hmax, Wmax, 3]
    q11 = img[tex_id, y1i, x1i]
    q12 = img[tex_id, y2i, x1i]
    q21 = img[tex_id, y1i, x2i]
    q22 = img[tex_id, y2i, x2i]

    # Weights use the *wrapped* x2/y2 values; then the x1==x2 degenerate case
    # (1-texel-wide image) bumps x2 by one — all per texture.cpp:17-25.
    x2 = x2i.astype(x.dtype)
    y2 = y2i.astype(y.dtype)
    x2 = jnp.where(x1i == x2i, x2 + 1.0, x2)
    y2 = jnp.where(y1i == y2i, y2 + 1.0, y2)

    denom = (x2 - x1) * (y2 - y1)
    num = (
        q11 * ((x2 - x) * (y2 - y))[:, None]
        + q21 * ((x - x1) * (y2 - y))[:, None]
        + q12 * ((x2 - x) * (y - y1))[:, None]
        + q22 * ((x - x1) * (y - y1))[:, None]
    )
    bilerp = num / denom[:, None]

    is_img = (kind == TEX_IMAGE)[:, None]
    return jnp.where(is_img, bilerp, const_val)
