"""Mesh-loader tests for the formats with no shipped asset (VERDICT r1
partial #51): PLY (ascii + binary_little_endian) and glTF (embedded
base64 + GLB container), generated on the fly and checked against the
known geometry.  OBJ/.serialized are exercised by the scene round-trip
tests (tests/test_parser.py on the reference assets)."""

import base64
import json
import struct

import numpy as np

from mcpt_tpu.scene.loaders import load_gltf, load_mesh, load_ply

# one quad: 4 vertices, 2 triangles
POS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
)
NRM = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
UV = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
IDX = np.array([[0, 1, 2], [0, 2, 3]], np.int32)


def _check(mesh, uv=True, nrm=True):
    np.testing.assert_allclose(mesh.positions, POS)
    np.testing.assert_array_equal(mesh.indices, IDX)
    if nrm:
        np.testing.assert_allclose(mesh.normals, NRM)
    if uv:
        assert mesh.texcoords is not None


def test_ply_ascii(tmp_path):
    lines = [
        "ply", "format ascii 1.0",
        "element vertex 4",
        "property float x", "property float y", "property float z",
        "property float nx", "property float ny", "property float nz",
        "element face 2",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    for p, n in zip(POS, NRM):
        lines.append(" ".join(str(v) for v in [*p, *n]))
    for f in IDX:
        lines.append("3 " + " ".join(str(i) for i in f))
    path = tmp_path / "quad.ply"
    path.write_bytes(("\n".join(lines) + "\n").encode())
    _check(load_ply(str(path)), uv=False)


def test_ply_binary_little_endian(tmp_path):
    head = (
        "ply\nformat binary_little_endian 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    ).encode()
    body = POS.astype("<f4").tobytes()
    for f in IDX:
        body += struct.pack("<B", 3) + f.astype("<i4").tobytes()
    path = tmp_path / "quad_bin.ply"
    path.write_bytes(head + body)
    _check(load_ply(str(path)), uv=False, nrm=False)


def _gltf_dict(buffer_uri):
    blob = (
        POS.astype("<f4").tobytes()
        + NRM.astype("<f4").tobytes()
        + UV.astype("<f4").tobytes()
        + IDX.astype("<u2").tobytes()
    )
    return {
        "asset": {"version": "2.0"},
        "buffers": [{"uri": buffer_uri.format(
            b64=base64.b64encode(blob).decode()), "byteLength": len(blob)}]
        if buffer_uri else [{"byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3,
        }]}],
    }, blob


def test_gltf_embedded(tmp_path):
    g, _ = _gltf_dict("data:application/octet-stream;base64,{b64}")
    path = tmp_path / "quad.gltf"
    path.write_text(json.dumps(g))
    _check(load_gltf(str(path)))


def test_glb_container(tmp_path):
    g, blob = _gltf_dict(None)
    g["buffers"] = [{"byteLength": len(blob)}]
    js = json.dumps(g).encode()
    js += b" " * (-len(js) % 4)
    blob += b"\x00" * (-len(blob) % 4)
    glb = (
        struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(blob))
        + struct.pack("<II", len(js), 0x4E4F534A) + js
        + struct.pack("<II", len(blob), 0x004E4942) + blob
    )
    path = tmp_path / "quad.glb"
    path.write_bytes(glb)
    _check(load_gltf(str(path)))


def test_load_mesh_dispatches_by_extension(tmp_path):
    g, _ = _gltf_dict("data:application/octet-stream;base64,{b64}")
    path = tmp_path / "quad.gltf"
    path.write_text(json.dumps(g))
    mesh = load_mesh(str(path))
    assert mesh.positions.shape == (4, 3)
