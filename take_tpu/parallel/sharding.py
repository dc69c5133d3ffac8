"""Multi-device rendering: shard the path axis over a device mesh.

The scaling design (SURVEY §2.3): image tiles / ray batches are DATA
parallel — the path axis is sharded with NamedSharding(P("rays")) while the
scene pytree is replicated; XLA/GSPMD partitions the whole wavefront program
with zero collectives in the forward pass (rays never talk to each other)
and a single psum for replicated-parameter gradients in the backward pass.
The same code path runs on 1 chip, N chips, or (with jax.distributed
initialized by the launcher) N hosts; tiles stay resident on their shard and
the scene is replicated per device, so all communication rides ICI.

Determinism: the counter-based RNG keys by (pixel, sample), not by device,
so images are bit-identical at any device count — asserted in
tests/test_sharding.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from take_tpu.render import render_pass
from take_tpu.scene.types import RenderOptions, Scene

AXIS = "rays"


def make_mesh(n_devices=None):
    """1-D device mesh over the ray/path axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def shard_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Replicate all scene arrays onto the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.device_put(scene, repl)


def render_image_sharded(
    scene: Scene,
    options: RenderOptions = RenderOptions(),
    mesh: Mesh = None,
):
    """Full-frame render with the pixel axis sharded across the mesh.

    Returns [H, W, 3] float32 numpy (y-flipped), bit-identical to the
    single-device render_image for the same options.seed.
    """
    if mesh is None:
        mesh = make_mesh()
    cam = scene.meta.camera
    W, H = cam.width, cam.height
    n_pixels = W * H
    n_dev = mesh.devices.size

    scene = shard_scene(scene, mesh)
    ray_sharding = NamedSharding(mesh, P(AXIS))

    # pad the pixel axis to a multiple of the mesh size
    n_pad = -(-n_pixels // n_dev) * n_dev
    pix_host = np.arange(n_pad, dtype=np.int32)
    pix_host[n_pixels:] = 0  # dummy rays render pixel 0, discarded below
    pix = jax.device_put(jnp.asarray(pix_host), ray_sharding)

    k = max(
        1, min(options.spp, options.max_rays_per_pass * n_dev // max(n_pad, 1))
    )
    acc = None
    s = 0
    while s < options.spp:
        ns = min(k, options.spp - s)
        out = render_pass(scene, options, pix, jnp.int32(s), W, ns)
        acc = out if acc is None else acc + out
        s += ns

    img = np.asarray(acc)[:n_pixels].reshape(H, W, 3) / options.spp
    return img[::-1]
