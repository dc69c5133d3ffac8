"""Procedurally generate binary scene assets (meshes, textures, env maps).

Keeps the repo free of large binaries: XML scenes reference assets under
scenes/*/assets/, created deterministically by this script. Run directly or
via ensure_assets() (tests/bench call it lazily).
"""

import os
import struct

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))


def write_ply_binary(path, positions, indices, normals=None, uvs=None):
    """Binary little-endian PLY writer (counterpart of parse_ply)."""
    V = len(positions)
    props = ["property float x", "property float y", "property float z"]
    cols = [np.asarray(positions, "<f4")]
    if normals is not None:
        props += ["property float nx", "property float ny", "property float nz"]
        cols.append(np.asarray(normals, "<f4"))
    if uvs is not None:
        props += ["property float u", "property float v"]
        cols.append(np.asarray(uvs, "<f4"))
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {V}\n" + "\n".join(props) + "\n"
        f"element face {len(indices)}\n"
        "property list uchar int vertex_indices\nend_header\n"
    )
    data = np.concatenate(cols, axis=1).astype("<f4")
    with open(path, "wb") as fh:
        fh.write(header.encode())
        fh.write(data.tobytes())
        for f in np.asarray(indices, np.int64):
            fh.write(struct.pack("<B3i", 3, *f))


def uv_sphere(n_theta=24, n_phi=48, radius=1.0):
    """UV-sphere mesh with normals + uvs."""
    th = np.linspace(0, np.pi, n_theta)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    x = np.sin(T) * np.cos(P)
    y = np.cos(T)
    z = np.sin(T) * np.sin(P)
    pos = np.stack([x, y, z], -1).reshape(-1, 3) * radius
    nrm = pos / radius
    uv = np.stack([P / (2 * np.pi), T / np.pi], -1).reshape(-1, 2)
    idx = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            if i > 0:
                idx.append([a, b, c])
            if i < n_theta - 2:
                idx.append([b, d, c])
    return pos, np.asarray(idx), nrm, uv


def checker_texture(n=256, c0=(0.9, 0.85, 0.7), c1=(0.2, 0.25, 0.5), tiles=8):
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    mask = ((xx * tiles // n) + (yy * tiles // n)) % 2
    img = np.where(mask[..., None], np.asarray(c1), np.asarray(c0))
    return img.astype(np.float32)


def gradient_envmap(h=1024, w=2048, sun_dir=(0.5, 0.6, -0.4), sun_power=200.0):
    """Sky gradient + sun disc lat-long env map."""
    theta = (np.arange(h) + 0.5) / h * np.pi
    phi = ((np.arange(w) + 0.5) / w - 0.5) * 2 * np.pi
    TH, PH = np.meshgrid(theta, phi, indexing="ij")
    d = np.stack(
        [np.sin(TH) * np.sin(PH), np.cos(TH), -np.sin(TH) * np.cos(PH)], -1
    )
    sky_t = np.clip(d[..., 1] * 0.5 + 0.5, 0, 1)[..., None]
    horizon = np.array([0.8, 0.75, 0.7])
    zenith = np.array([0.25, 0.45, 0.85])
    img = horizon * (1 - sky_t) + zenith * sky_t
    ground = np.array([0.25, 0.22, 0.2])
    img = np.where(d[..., 1:2] < 0, ground, img)
    sun = np.asarray(sun_dir) / np.linalg.norm(sun_dir)
    cos_sun = d @ sun
    img = img + np.where(
        cos_sun[..., None] > 0.9995, sun_power * np.array([1.0, 0.95, 0.85]), 0.0
    )
    return img.astype(np.float32)


def ensure_assets():
    """Create all referenced binary assets if missing. Idempotent."""
    from take_tpu.io.exr import write_exr

    textured = os.path.join(ROOT, "textured", "assets")
    os.makedirs(textured, exist_ok=True)
    ply = os.path.join(textured, "ball.ply")
    if not os.path.exists(ply):
        pos, idx, nrm, uv = uv_sphere(32, 64, radius=0.5)
        write_ply_binary(ply, pos, idx, nrm, uv)
    tex = os.path.join(textured, "checker.exr")
    if not os.path.exists(tex):
        write_exr(tex, checker_texture())

    ibl = os.path.join(ROOT, "ibl", "assets")
    os.makedirs(ibl, exist_ok=True)
    env = os.path.join(ibl, "sky_2k.exr")
    if not os.path.exists(env):
        write_exr(env, gradient_envmap())

    serialized_dir = os.path.join(ROOT, "room", "assets")
    os.makedirs(serialized_dir, exist_ok=True)
    ser = os.path.join(serialized_dir, "room.serialized")
    if not os.path.exists(ser):
        from take_tpu.scene.parse_serialized import write_serialized

        # simple interior: box shell + columns, enough tris to exercise BVH
        rng = np.random.default_rng(7)
        pos_list, idx_list = [], []
        off = 0

        def add(p, i):
            nonlocal off
            pos_list.append(p)
            idx_list.append(np.asarray(i) + off)
            off += len(p)

        sp, si, _, _ = uv_sphere(48, 96, radius=1.0)
        for c in rng.uniform(-4, 4, (12, 3)):
            c[1] = abs(c[1]) * 0.3
            add(sp * rng.uniform(0.2, 0.7) + c, si)
        add(*_box_shell())
        write_serialized(
            ser,
            np.concatenate(pos_list).astype(np.float32),
            np.concatenate(idx_list).astype(np.int32),
        )
    return ROOT


def _box_shell(half=6.0, height=4.0):
    v = np.array(
        [
            [-half, 0, -half], [half, 0, -half], [half, 0, half], [-half, 0, half],
            [-half, height, -half], [half, height, -half],
            [half, height, half], [-half, height, half],
        ]
    )
    faces = np.array(
        [
            [0, 1, 2], [0, 2, 3],  # floor
            [4, 6, 5], [4, 7, 6],  # ceiling
            [0, 4, 5], [0, 5, 1],  # walls
            [1, 5, 6], [1, 6, 2],
            [2, 6, 7], [2, 7, 3],
            [3, 7, 4], [3, 4, 0],
        ]
    )
    return v, faces


if __name__ == "__main__":
    ensure_assets()
    print("assets ready under", ROOT)
