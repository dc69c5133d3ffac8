"""Scene frontend tests: OBJ/PLY/serialized loaders, XML parser, image I/O."""

import os
import textwrap

import numpy as np
import pytest

from take_tpu.io.exr import read_exr, write_exr
from take_tpu.io.pfm import read_pfm, write_pfm
from take_tpu.scene.parse_obj import parse_obj
from take_tpu.scene.parse_ply import parse_ply
from take_tpu.scene.parse_serialized import parse_serialized, write_serialized
from take_tpu.scene.parse_xml import parse_scene_file
from take_tpu.scene import transforms
from take_tpu.scene.types import (
    MAT_DIFFUSE,
    MAT_PLASTIC,
)


def test_obj_loader_quads_and_negatives(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(
        textwrap.dedent(
            """
            v 0 0 0
            v 1 0 0
            v 1 1 0
            v 0 1 0
            vt 0 0
            vt 1 0
            vt 1 1
            vt 0 1
            f -4/-4 -3/-3 -2/-2 -1/-1
            """
        )
    )
    mesh = parse_obj(p)
    assert mesh.positions.shape == (4, 3)
    assert mesh.indices.shape == (2, 3)  # quad -> 2 tris
    # vt flipped: t=0 -> 1
    np.testing.assert_allclose(mesh.uvs[0], [0, 1])
    np.testing.assert_allclose(mesh.indices, [[0, 1, 2], [0, 2, 3]])


def test_obj_transform_applied(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("v 1 0 0\nv 0 1 0\nv 0 0 1\nf 1 2 3\n")
    m = transforms.translate((10, 0, 0)) @ transforms.scale((2, 2, 2))
    mesh = parse_obj(p, m)
    np.testing.assert_allclose(mesh.positions[0], [12, 0, 0])


def test_ply_roundtrip_binary(tmp_path):
    p = tmp_path / "m.ply"
    header = (
        b"ply\nformat binary_little_endian 1.0\n"
        b"element vertex 3\n"
        b"property float x\nproperty float y\nproperty float z\n"
        b"property float nx\nproperty float ny\nproperty float nz\n"
        b"element face 1\n"
        b"property list uchar int vertex_indices\n"
        b"end_header\n"
    )
    verts = np.array(
        [[0, 0, 0, 0, 0, 1], [1, 0, 0, 0, 0, 1], [0, 1, 0, 0, 0, 1]], "<f4"
    )
    with open(p, "wb") as fh:
        fh.write(header)
        fh.write(verts.tobytes())
        fh.write(bytes([3]) + np.array([0, 1, 2], "<i4").tobytes())
    mesh = parse_ply(p)
    assert mesh.positions.shape == (3, 3)
    np.testing.assert_allclose(mesh.normals, [[0, 0, 1]] * 3)
    np.testing.assert_allclose(mesh.indices, [[0, 1, 2]])


def test_serialized_roundtrip(tmp_path):
    p = tmp_path / "m.serialized"
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    write_serialized(p, pos, idx, uvs=uvs)
    mesh = parse_serialized(p)
    np.testing.assert_allclose(mesh.positions, pos, atol=1e-6)
    np.testing.assert_allclose(mesh.indices, idx)
    np.testing.assert_allclose(mesh.uvs, uvs, atol=1e-6)


def test_exr_roundtrip_and_pfm(tmp_path):
    img = np.random.default_rng(0).random((33, 65, 3)).astype(np.float32) * 4
    f = tmp_path / "t.exr"
    write_exr(f, img)
    back = read_exr(f)
    fp16_err = np.abs(img.astype(np.float16).astype(np.float32) - img).max()
    assert np.abs(back - img).max() <= fp16_err + 1e-7

    f2 = tmp_path / "t.pfm"
    write_pfm(f2, img)
    np.testing.assert_allclose(read_pfm(f2), img, atol=1e-7)


def test_xml_parser_cbox():
    scene_path = os.path.join(
        os.path.dirname(__file__), "..", "scenes", "cbox", "cbox.xml"
    )
    builder = parse_scene_file(scene_path, build=False)
    assert builder.camera.width == 256
    assert builder.spp == 16
    np.testing.assert_allclose(builder.camera.vfov, 39.3077)
    np.testing.assert_allclose(builder.camera.lookfrom, (278, 273, -800))
    # 6 obj shapes: 3 walls-group(6 tri) + red(2) + green(2) + short(10) +
    # tall(10) + light(2) = 32 triangles, 2 of which are emissive
    assert len(builder._tris) == 32
    assert len(builder._lights) == 2
    scene = builder.build()
    assert scene.meta.n_tri == 32
    assert scene.meta.n_lights == 2
    assert scene.meta.used_material_tags == (MAT_DIFFUSE,)
    # light power pmf filled (reference never fills it ⚠ scene.h:28-29)
    np.testing.assert_allclose(np.asarray(scene.lights.power_pmf).sum(), 1.0,
                               rtol=1e-5)


def test_xml_defaults_substitution(tmp_path):
    xml = textwrap.dedent(
        """<?xml version="1.0"?>
        <scene version="0.6.0">
          <default name="myspp" value="7"/>
          <default name="ref_val" value="0.25, 0.5, 0.75"/>
          <sensor type="perspective">
            <float name="fov" value="45"/>
            <transform name="toWorld">
              <lookat origin="0,0,1" target="0,0,0" up="0,1,0"/>
            </transform>
            <sampler type="independent">
              <integer name="sampleCount" value="$myspp"/>
            </sampler>
            <film type="hdrfilm">
              <integer name="width" value="32"/>
              <integer name="height" value="16"/>
            </film>
          </sensor>
          <bsdf type="plastic" id="p">
            <rgb name="reflectance" value="$ref_val"/>
            <float name="ior" value="1.9"/>
          </bsdf>
          <shape type="sphere">
            <float name="radius" value="0.5"/>
            <point name="center" x="1" y="2" z="3"/>
            <ref id="p"/>
          </shape>
        </scene>
        """
    )
    p = tmp_path / "s.xml"
    p.write_text(xml)
    b = parse_scene_file(p, build=False)
    assert b.spp == 7
    assert b.camera.width == 32 and b.camera.height == 16
    assert b._materials[0].tag == MAT_PLASTIC
    np.testing.assert_allclose(b._materials[0].tex_value, (0.25, 0.5, 0.75))
    assert b._materials[0].eta == 1.9
    center, radius, mat, light = b._spheres[0]
    np.testing.assert_allclose(center, (1, 2, 3))
    assert radius == 0.5 and light == -1
    # fovAxis defaults to x -> vertical fov of a 32x16 film is smaller
    assert b.camera.vfov < 45.0


def test_xml_fov_axis_default_is_x(tmp_path):
    xml = textwrap.dedent(
        """<?xml version="1.0"?>
        <scene version="0.6.0">
          <sensor type="perspective">
            <float name="fov" value="90"/>
            <transform name="toWorld">
              <lookat origin="0,0,1" target="0,0,0" up="0,1,0"/>
            </transform>
            <film type="hdrfilm">
              <integer name="width" value="200"/>
              <integer name="height" value="100"/>
            </film>
          </sensor>
        </scene>
        """
    )
    p = tmp_path / "s.xml"
    p.write_text(xml)
    b = parse_scene_file(p, build=False)
    # fov_x=90 at aspect 2:1 -> tan(fov_y/2) = tan(45)*100/200 = 0.5
    np.testing.assert_allclose(
        b.camera.vfov, np.degrees(2 * np.arctan(0.5)), rtol=1e-6
    )


def test_xml_rectangle_shape(tmp_path):
    xml = textwrap.dedent(
        """<?xml version="1.0"?>
        <scene version="0.6.0">
          <shape type="rectangle">
            <transform name="toWorld">
              <scale value="2"/>
              <translate z="5"/>
            </transform>
            <bsdf type="diffuse"/>
          </shape>
        </scene>
        """
    )
    p = tmp_path / "s.xml"
    p.write_text(xml)
    b = parse_scene_file(p, build=False)
    assert len(b._tris) == 2
    v0 = b._tris[0][0]
    np.testing.assert_allclose(v0, [-2, -2, 5])
