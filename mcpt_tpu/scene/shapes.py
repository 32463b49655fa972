"""Host-side shape tessellation + world-space transform
(csrt src/rtcore/scene.cpp:196-281).

Analytic quadrics (sphere/disk/cylinder) get their own primitive tables
later; rectangle and cube are tessellated into triangles exactly like the
reference so golden images line up (scene.cpp:196-245).
"""

from __future__ import annotations

import numpy as np

from mcpt_tpu.scene.ir import InstanceInfo, MeshData

# Rectangle: [-1,1]^2 at z=0, +z normal (csrt scene.cpp:196-212)
_RECT_POS = np.array(
    [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
)
_RECT_UV = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
_RECT_NRM = np.array([[0, 0, 1]] * 4, np.float32)
_RECT_IDX = np.array([[0, 1, 2], [2, 3, 0]], np.int32)

# Cube: [-1,1]^3, 24 verts / 12 tris, outward per-face normals
# (csrt scene.cpp:214-245)
_CUBE_POS = np.array(
    [
        [1, -1, -1], [1, -1, 1], [-1, -1, 1], [-1, -1, -1],
        [1, 1, -1], [-1, 1, -1], [-1, 1, 1], [1, 1, 1],
        [1, -1, -1], [1, 1, -1], [1, 1, 1], [1, -1, 1],
        [1, -1, 1], [1, 1, 1], [-1, 1, 1], [-1, -1, 1],
        [-1, -1, 1], [-1, 1, 1], [-1, 1, -1], [-1, -1, -1],
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
    ],
    np.float32,
)
_CUBE_NRM = np.array(
    [
        [0, -1, 0], [0, -1, 0], [0, -1, 0], [0, -1, 0],
        [0, 1, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0],
        [1, 0, 0], [1, 0, 0], [1, 0, 0], [1, 0, 0],
        [0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 0, 1],
        [-1, 0, 0], [-1, 0, 0], [-1, 0, 0], [-1, 0, 0],
        [0, 0, -1], [0, 0, -1], [0, 0, -1], [0, 0, -1],
    ],
    np.float32,
)
_CUBE_UV = np.tile(
    np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32), (6, 1)
)
_CUBE_IDX = np.array(
    [
        [0, 1, 2], [3, 0, 2], [4, 5, 6], [7, 4, 6],
        [8, 9, 10], [11, 8, 10], [12, 13, 14], [15, 12, 14],
        [16, 17, 18], [19, 16, 18], [20, 21, 22], [23, 20, 22],
    ],
    np.int32,
)


def rectangle_mesh() -> MeshData:
    return MeshData(
        positions=_RECT_POS.copy(),
        indices=_RECT_IDX.copy(),
        normals=_RECT_NRM.copy(),
        texcoords=_RECT_UV.copy(),
    )


def cube_mesh() -> MeshData:
    return MeshData(
        positions=_CUBE_POS.copy(),
        indices=_CUBE_IDX.copy(),
        normals=_CUBE_NRM.copy(),
        texcoords=_CUBE_UV.copy(),
    )


def sphere_mesh(subdiv: int = 4) -> MeshData:
    """Icosphere tessellation fallback for sphere instances until the
    analytic quadric path lands (csrt intersects spheres analytically,
    sphere.cpp:17-88)."""
    t = (1.0 + 5.0**0.5) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]
    verts = [tuple(v) for v in verts]
    for _ in range(subdiv):
        cache = {}
        vlist = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = np.asarray(vlist[a]) + np.asarray(vlist[b])
                m /= np.linalg.norm(m)
                cache[key] = len(vlist)
                vlist.append(tuple(m))
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = new_faces
        verts = vlist

    pos = np.asarray(verts, np.float32)
    nrm = pos.copy()
    theta = np.arccos(np.clip(pos[:, 1], -1, 1))
    phi = np.arctan2(pos[:, 2], pos[:, 0])
    phi = np.where(phi < 0, phi + 2 * np.pi, phi)
    uv = np.stack([phi / (2 * np.pi), theta / np.pi], axis=-1).astype(np.float32)
    return MeshData(
        positions=pos,
        indices=np.asarray(faces, np.int32),
        normals=nrm,
        texcoords=uv,
    )


def disk_mesh(segments: int = 64) -> MeshData:
    """Unit-DIAMETER disk at z=0 (csrt intersects analytically,
    disk.cpp:17-120: radius 0.5, polar uv), tessellated as a fan."""
    ang = np.linspace(0.0, 2 * np.pi, segments, endpoint=False)
    rim = np.stack(
        [0.5 * np.cos(ang), 0.5 * np.sin(ang), np.zeros(segments)], axis=-1
    ).astype(np.float32)
    pos = np.concatenate([np.zeros((1, 3), np.float32), rim])
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (segments + 1, 1))
    # polar uv: u = r, v = phi/2pi (disk.cpp:64-71)
    uv = np.concatenate(
        [np.zeros((1, 2), np.float32),
         np.stack([np.ones(segments), ang / (2 * np.pi)], -1).astype(np.float32)]
    )
    idx = np.stack(
        [np.zeros(segments, np.int32),
         np.arange(1, segments + 1, dtype=np.int32),
         np.roll(np.arange(1, segments + 1, dtype=np.int32), -1)],
        axis=-1,
    )
    return MeshData(positions=pos, indices=idx, normals=nrm, texcoords=uv)


def cylinder_mesh(p0, p1, radius, segments: int = 64) -> MeshData:
    """Open finite cylinder from p0 to p1 (csrt cylinder.cpp:21-60),
    tessellated; uv = (phi/2pi, axial)."""
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    axis = p1 - p0
    length = np.linalg.norm(axis)
    axis = axis / max(length, 1e-12)
    helper = np.array([0.0, 1.0, 0.0]) if abs(axis[0]) > 0.9 else np.array([1.0, 0.0, 0.0])
    t = np.cross(helper, axis)
    t /= np.linalg.norm(t)
    b = np.cross(axis, t)

    ang = np.linspace(0.0, 2 * np.pi, segments, endpoint=False)
    ring_dir = np.outer(np.cos(ang), t) + np.outer(np.sin(ang), b)  # [S,3]
    bottom = p0[None] + radius * ring_dir
    top = p1[None] + radius * ring_dir
    pos = np.concatenate([bottom, top]).astype(np.float32)
    nrm = np.concatenate([ring_dir, ring_dir]).astype(np.float32)
    u = (ang / (2 * np.pi)).astype(np.float32)
    uv = np.concatenate(
        [np.stack([u, np.zeros(segments, np.float32)], -1),
         np.stack([u, np.ones(segments, np.float32)], -1)]
    )
    i = np.arange(segments, dtype=np.int32)
    j = (i + 1) % segments
    idx = np.concatenate(
        [np.stack([i, j, i + segments], -1),
         np.stack([j, j + segments, i + segments], -1)]
    )
    return MeshData(positions=pos, indices=idx, normals=nrm, texcoords=uv)


def instance_triangles(info: InstanceInfo):
    """Lower one instance to world-space triangle soup.

    Returns (positions [F,3,3], normals [F,3,3] | None,
    texcoords [F,3,2] | None, tangents [F,3,3] | None).
    Mirrors csrt CommitMeshes' world transform (scene.cpp:261-281):
    positions via to_world, normals via inverse-transpose.
    """
    if info.shape == "rectangle":
        mesh = rectangle_mesh()
    elif info.shape == "cube":
        mesh = cube_mesh()
    elif info.shape == "sphere":
        mesh = sphere_mesh()
        mesh.positions = mesh.positions * np.float32(info.radius) + np.asarray(
            info.center, np.float32
        )
        # note: normals stay the unit sphere dirs; scaling is uniform
    elif info.shape == "disk":
        mesh = disk_mesh()
    elif info.shape == "cylinder":
        mesh = cylinder_mesh(info.p0, info.p1, info.radius)
    elif info.shape == "mesh":
        mesh = info.mesh
        assert mesh is not None, "mesh instance without mesh data"
    else:
        raise ValueError(f"unsupported shape '{info.shape}'")

    m = np.asarray(info.to_world, np.float32)
    pos_h = np.concatenate(
        [mesh.positions, np.ones((len(mesh.positions), 1), np.float32)], axis=1
    )
    pos_w = (pos_h @ m.T)[:, :3]

    normals = mesh.normals
    if normals is not None:
        # normal matrix = inverse-transpose of the linear part
        nmat = np.linalg.inv(m[:3, :3]).T
        nrm_w = normals @ nmat.T
        nl = np.linalg.norm(nrm_w, axis=1, keepdims=True)
        nrm_w = nrm_w / np.maximum(nl, 1e-12)
        if info.flip_normals:
            nrm_w = -nrm_w
    else:
        nrm_w = None

    tangents = mesh.tangents
    if tangents is not None:
        tan_w = tangents @ m[:3, :3].T
        tl = np.linalg.norm(tan_w, axis=1, keepdims=True)
        tan_w = tan_w / np.maximum(tl, 1e-12)
    else:
        tan_w = None

    idx = np.asarray(mesh.indices, np.int64)
    tri_pos = pos_w[idx]
    tri_nrm = nrm_w[idx] if nrm_w is not None else None
    tri_uv = (
        np.asarray(mesh.texcoords, np.float32)[idx]
        if mesh.texcoords is not None
        else None
    )
    tri_tan = tan_w[idx] if tan_w is not None else None
    return tri_pos.astype(np.float32), tri_nrm, tri_uv, tri_tan


def triangle_areas(tri_pos: np.ndarray) -> np.ndarray:
    e1 = tri_pos[:, 1] - tri_pos[:, 0]
    e2 = tri_pos[:, 2] - tri_pos[:, 0]
    return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
