"""Programmatic test scenes shared across the suite."""

import numpy as np

from take_tpu.core.camera import Camera
from take_tpu.scene.build import SceneBuilder
from take_tpu.scene.types import (
    MAT_DIFFUSE,
    MAT_MIRROR,
    MAT_PLASTIC,
)


def quad(p0, p1, p2, p3):
    """Two triangles for quad p0..p3 (counter-clockwise)."""
    positions = np.array([p0, p1, p2, p3], np.float64)
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return positions, indices


# material ids assigned by cornell_box's builder, in add_material order
# (white is shared by floor/ceiling/back/boxes when mirror=False)
CBOX_MAT_WHITE = 0
CBOX_MAT_RED = 1
CBOX_MAT_GREEN = 2


def cornell_box(width=64, height=64, light_scale=1.0, mirror=False):
    """A self-contained Cornell box: 5 diffuse walls + area light + 2 boxes.

    Geometry mirrors the classic 1x1x1 box. Camera looks down -z.
    """
    b = SceneBuilder()
    # frustum chosen to land fully inside the open box front
    # (halfwidth at z=0: tan(16.5 deg) * 1.4 = 0.41 < 0.5)
    b.camera = Camera(
        width=width,
        height=height,
        lookfrom=(0.5, 0.5, 1.4),
        lookat=(0.5, 0.5, 0.0),
        up=(0.0, 1.0, 0.0),
        vfov=33.0,
    )
    b.background = np.zeros(3)

    white = b.add_material(MAT_DIFFUSE, tex_value=(0.73, 0.73, 0.73))
    red = b.add_material(MAT_DIFFUSE, tex_value=(0.65, 0.05, 0.05))
    green = b.add_material(MAT_DIFFUSE, tex_value=(0.12, 0.45, 0.15))
    box_mat = (
        b.add_material(MAT_MIRROR, tex_value=(0.9, 0.9, 0.9))
        if mirror
        else white
    )
    light_mat = b.add_material(MAT_DIFFUSE, tex_value=(0.0, 0.0, 0.0))

    # floor, ceiling, back, left(red), right(green) — normals point inward
    b.add_mesh(*quad([0, 0, 0], [1, 0, 0], [1, 0, -1], [0, 0, -1]), white)
    b.add_mesh(*quad([0, 1, 0], [0, 1, -1], [1, 1, -1], [1, 1, 0]), white)
    b.add_mesh(*quad([0, 0, -1], [1, 0, -1], [1, 1, -1], [0, 1, -1]), white)
    b.add_mesh(*quad([0, 0, 0], [0, 0, -1], [0, 1, -1], [0, 1, 0]), red)
    b.add_mesh(*quad([1, 0, 0], [1, 1, 0], [1, 1, -1], [1, 0, -1]), green)

    # ceiling light (slightly below ceiling), emissive both?? — emits from its
    # faces; normal down into the box
    l = 0.35 * light_scale
    c = 0.5
    # wound so the geometric normal points DOWN (-y) into the box
    b.add_mesh(
        *quad(
            [c - l / 2, 0.999, -c - l / 2],
            [c + l / 2, 0.999, -c - l / 2],
            [c + l / 2, 0.999, -c + l / 2],
            [c - l / 2, 0.999, -c + l / 2],
        ),
        light_mat,
        emission=(15.0, 15.0, 15.0),
    )

    # tall box (rotated) — approximate with an axis-aligned block for tests
    def block(x0, x1, y0, y1, z0, z1, mat):
        for p, i in [
            quad([x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1]),  # front
            quad([x1, y0, z0], [x0, y0, z0], [x0, y1, z0], [x1, y1, z0]),  # back
            quad([x0, y0, z0], [x0, y0, z1], [x0, y1, z1], [x0, y1, z0]),  # left
            quad([x1, y0, z1], [x1, y0, z0], [x1, y1, z0], [x1, y1, z1]),  # right
            quad([x0, y1, z1], [x1, y1, z1], [x1, y1, z0], [x0, y1, z0]),  # top
        ]:
            b.add_mesh(p, i, mat)

    block(0.1, 0.45, 0.0, 0.6, -0.75, -0.4, box_mat)
    block(0.55, 0.9, 0.0, 0.3, -0.55, -0.2, white)

    b.spp = 16
    return b


def sphere_furnace(albedo=0.5, width=32, height=32):
    """Diffuse sphere in constant background; exact L = albedo * bg at the
    sphere, bg elsewhere (single interreflection-free convex body)."""
    b = SceneBuilder()
    b.camera = Camera(
        width=width,
        height=height,
        lookfrom=(0.0, 0.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
        up=(0.0, 1.0, 0.0),
        vfov=45.0,
    )
    b.background = np.ones(3)
    m = b.add_material(MAT_DIFFUSE, tex_value=(albedo, albedo, albedo))
    b.add_sphere((0.0, 0.0, 0.0), 1.0, m)
    return b
