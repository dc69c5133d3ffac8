"""Checkpoint / resume for long renders (SURVEY §5: the reference has none —
whole image rendered in one shot, main.cpp:21-22).

The accumulator state is tiny and exact: per-pixel radiance sums + the
number of completed samples. Because the RNG is counter-based and keyed by
(pixel, sample), resuming at sample k continues the *identical* sample
stream — a resumed render is bit-equal to an uninterrupted one.
"""

import json
import os

import numpy as np


def save_accumulator(path, acc, spp_done, seed, meta=None):
    """Atomically write accumulator state. acc: [n_pixels, 3] radiance SUM."""
    tmp = str(path) + ".tmp"
    np.savez_compressed(
        tmp,
        acc=np.asarray(acc, np.float32),
        spp_done=np.int64(spp_done),
        seed=np.int64(seed),
        meta=json.dumps(meta or {}),
    )
    os.replace(tmp + ".npz", path)


def load_accumulator(path):
    """Returns (acc, spp_done, seed, meta) or None if absent."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        return (
            z["acc"],
            int(z["spp_done"]),
            int(z["seed"]),
            json.loads(str(z["meta"])),
        )


def render_image_resumable(scene, options, checkpoint_path,
                           checkpoint_every=4, progress=None):
    """Like render.render_image but checkpointing every `checkpoint_every`
    sample batches; restartable at any point."""
    import jax.numpy as jnp

    from take_tpu.render import render_pass

    cam = scene.meta.camera
    W, H = cam.width, cam.height
    n_pixels = W * H

    state = load_accumulator(checkpoint_path)
    if state is not None:
        acc, spp_done, seed, _ = state
        if seed != options.seed or acc.shape[0] != n_pixels:
            raise ValueError(
                "checkpoint does not match render configuration "
                f"(seed {seed} vs {options.seed}, pixels {acc.shape[0]})"
            )
        acc = jnp.asarray(acc)
    else:
        acc = jnp.zeros((n_pixels, 3), jnp.float32)
        spp_done = 0

    pix = jnp.arange(n_pixels, dtype=jnp.int32)
    k = max(1, min(options.spp, options.max_rays_per_pass // max(n_pixels, 1)))
    since_ckpt = 0
    s = spp_done
    while s < options.spp:
        ns = min(k, options.spp - s)
        acc = acc + render_pass(scene, options, pix, jnp.int32(s), W, ns)
        s += ns
        since_ckpt += 1
        if progress is not None:
            progress(s, options.spp)
        if since_ckpt >= checkpoint_every and s < options.spp:
            save_accumulator(checkpoint_path, acc, s, options.seed)
            since_ckpt = 0

    img = np.asarray(acc).reshape(H, W, 3) / options.spp
    # final checkpoint records completion
    save_accumulator(checkpoint_path, acc, options.spp, options.seed,
                     meta={"complete": True})
    return img[::-1]
