"""Device geometry: flat world-space triangle SoA + implicit BVH.

The reference commits per-instance BLASes plus a TLAS of instance AABBs,
all in world space already (csrt src/rtcore/scene.cpp:261-324,474-533).
Since BLASes are world-space, the two-level structure only buys
per-instance binding — so the TPU design merges everything into ONE
global BVH over all world-space primitives and keeps a per-primitive
`inst_id` for BSDF/medium binding.  Fewer indirections, one traversal.

Primitives are stored Morton-sorted and padded (see scene/bvh.py);
padding prims have zero edge vectors (never hit).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.scene.bvh import build_bvh


@flax.struct.dataclass
class Geometry:
    # Morton-sorted, padded primitive SoA (world space)
    p0: jnp.ndarray   # [P, 3] vertex 0
    e1: jnp.ndarray   # [P, 3] v1 - v0
    e2: jnp.ndarray   # [P, 3] v2 - v0
    n0: jnp.ndarray   # [P, 3] shading normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    tg0: jnp.ndarray  # [P, 3] tangents
    tg1: jnp.ndarray
    tg2: jnp.ndarray
    bt0: jnp.ndarray  # [P, 3] bitangents
    bt1: jnp.ndarray
    bt2: jnp.ndarray
    uv0: jnp.ndarray  # [P, 2]
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    inst_id: jnp.ndarray  # [P] int32 (padding = 0; masked by hit validity)
    opaque: jnp.ndarray   # [P] bool — blocks shadow rays (null-boundary
    #                       medium shells don't; padding False)
    # implicit BVH
    node_min: jnp.ndarray  # [M, 3]
    node_max: jnp.ndarray  # [M, 3]
    # leaf-blocked triangle pack for packet traversal: one dense tile per
    # leaf fetched by scalar index — [n_pad_leaves, leaf_size, 12] with
    # rows (p0.xyz, e1.xyz, e2.xyz, opaque, 0, 0)
    packed_tris: jnp.ndarray
    # coarse binned-SAH chunk pack for the leaf-march traversal (large
    # scenes): <=2048 spatially tight chunks of <= `march_leaf` prims,
    # with per-chunk AABBs — no tree, culling is a dense [rays x chunks]
    # slab test (see ops/traversal._intersect_march).  Row channel 10 =
    # global prim id (chunk order != sorted-array order).
    march_tris: jnp.ndarray  # [Lm, march_leaf, 12]
    march_min: jnp.ndarray   # [Lm, 3]
    march_max: jnp.ndarray   # [Lm, 3]
    # static topology facts
    n_pad_leaves: int = flax.struct.field(pytree_node=False)
    leaf_size: int = flax.struct.field(pytree_node=False)
    depth: int = flax.struct.field(pytree_node=False)
    n_real_prims: int = flax.struct.field(pytree_node=False)
    n_march_leaves: int = flax.struct.field(pytree_node=False, default=1)
    march_leaf: int = flax.struct.field(pytree_node=False, default=1)
    # chunk index of each sorted prim (padding prims -> 0): lets the
    # integrator sort continuation/shadow rays by the SAH chunk their
    # ORIGIN lies in, so a march block's chunk-corridor union collapses
    # toward its per-ray corridor (traversal._ray_sort_keys coherence)
    march_chunk_of_prim: jnp.ndarray | None = None  # [P] int32


def _sah_chunks(cent, tmin, tmax, leaf, nbins=16):
    """Binned-SAH chunk partition: native C when buildable (native/sah.c
    — dining-room 270k prims in ~0.1 s vs ~2.7 s Python), else the
    Python oracle below.  Both produce identical chunks (exact-parity
    test in tests/test_bvh.py)."""
    try:
        from mcpt_tpu import native

        return native.sah_chunks(cent, tmin, tmax, leaf, nbins)
    except Exception:
        return _sah_chunks_py(cent, tmin, tmax, leaf, nbins)


def _sah_chunks_py(cent, tmin, tmax, leaf, nbins=16):
    """Top-down binned-SAH partition of prims into chunks of <= `leaf`.

    The march traversal's cost per ray is (chunks entered) x (sweep of
    `leaf` tris), so the split objective is the classic surface-area
    heuristic: min SA(L)*|L| + SA(R)*|R| over 16 centroid bins on the
    longest axis (csrt bvh_builder.cpp's object split, flattened to
    chunk granularity; longest-axis-only measures within ~8% of 3-axis
    and builds ~6x faster — 270k-prim dining-room in 2.7 s).
    Returns a list of int64 index arrays into the input prim order.
    """
    out = []
    stack = [np.arange(cent.shape[0], dtype=np.int64)]
    while stack:
        ix = stack.pop()
        if ix.size <= leaf:
            out.append(ix)
            continue
        c = cent[ix]
        lo, hi = c.min(axis=0), c.max(axis=0)
        ax = int(np.argmax(hi - lo))
        if hi[ax] - lo[ax] < 1e-12:  # all centroids coincide
            stack += [ix[: ix.size // 2], ix[ix.size // 2 :]]
            continue
        b = np.minimum(
            ((c[:, ax] - lo[ax]) / (hi[ax] - lo[ax]) * nbins).astype(
                np.int32
            ),
            nbins - 1,
        )
        cnt = np.bincount(b, minlength=nbins)
        bmin = np.full((nbins, 3), np.inf, np.float32)
        bmax = np.full((nbins, 3), -np.inf, np.float32)
        for k in range(3):
            np.minimum.at(bmin[:, k], b, tmin[ix, k])
            np.maximum.at(bmax[:, k], b, tmax[ix, k])
        cl = np.cumsum(cnt)[:-1]
        cr = ix.size - cl
        pmin = np.minimum.accumulate(bmin, 0)
        pmax = np.maximum.accumulate(bmax, 0)
        smin = np.minimum.accumulate(bmin[::-1], 0)[::-1]
        smax = np.maximum.accumulate(bmax[::-1], 0)[::-1]

        def sa(mn, mx):
            d = np.clip(mx - mn, 0, None)
            return 2 * (
                d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 0] * d[:, 2]
            )

        cost = np.where(
            (cl > 0) & (cr > 0),
            sa(pmin, pmax)[:-1] * cl + sa(smin, smax)[1:] * cr,
            np.inf,
        )
        i = int(np.argmin(cost))
        if not np.isfinite(cost[i]):
            stack += [ix[: ix.size // 2], ix[ix.size // 2 :]]
            continue
        stack += [ix[b <= i], ix[b > i]]
    return out


def _gram_schmidt_frames(normals: np.ndarray, positions, texcoords):
    """Build per-vertex tangent frames from uv derivatives when the mesh
    supplies none, falling back to an arbitrary ONB (csrt scene.cpp:63-102
    behavior, re-derived)."""
    n = normals
    # arbitrary tangent orthogonal to n
    helper = np.where(
        np.abs(n[:, 0:1]) > 0.9, np.array([[0.0, 1.0, 0.0]]), np.array([[1.0, 0.0, 0.0]])
    ).astype(np.float32)
    t = np.cross(helper, n)
    t /= np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    b = np.cross(n, t)
    b /= np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    return t, b


def commit_geometry(
    tri_positions: np.ndarray,   # [P, 3, 3] world-space vertices
    tri_normals: np.ndarray | None,     # [P, 3, 3] per-vertex shading normals
    tri_texcoords: np.ndarray | None,   # [P, 3, 2]
    tri_tangents: np.ndarray | None,    # [P, 3, 3]
    tri_inst_id: np.ndarray,     # [P]
    leaf_size: int = 4,
    tri_opaque: np.ndarray | None = None,  # [P] bool; default all-opaque
) -> Geometry:
    """Build the device Geometry from host triangle soup."""
    pos = np.asarray(tri_positions, np.float32)
    p = pos.shape[0]
    inst = np.asarray(tri_inst_id, np.int32)
    opaque = (
        np.ones(p, np.bool_)
        if tri_opaque is None
        else np.asarray(tri_opaque, np.bool_)
    )

    gn = np.cross(pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0])
    gn_len = np.linalg.norm(gn, axis=-1, keepdims=True)
    gn = gn / np.maximum(gn_len, 1e-20)

    if tri_normals is None:
        normals = np.repeat(gn[:, None, :], 3, axis=1)
    else:
        normals = np.asarray(tri_normals, np.float32)
    if tri_texcoords is None:
        texcoords = np.zeros((p, 3, 2), np.float32)
        texcoords[:, 1, 0] = 1.0
        texcoords[:, 2, 1] = 1.0
    else:
        texcoords = np.asarray(tri_texcoords, np.float32)
    if tri_tangents is None:
        flat_n = normals.reshape(-1, 3)
        t, b = _gram_schmidt_frames(flat_n, None, None)
        tangents = t.reshape(p, 3, 3)
        bitangents = b.reshape(p, 3, 3)
    else:
        tangents = np.asarray(tri_tangents, np.float32)
        bitangents = np.cross(normals, tangents)
        bl = np.linalg.norm(bitangents, axis=-1, keepdims=True)
        bitangents = bitangents / np.maximum(bl, 1e-12)

    prim_min = pos.min(axis=1)
    prim_max = pos.max(axis=1)
    bvh = build_bvh(prim_min, prim_max, leaf_size=leaf_size)

    # Reorder + pad all attribute arrays by the Morton order.
    def pick(a, fill=0.0):
        out = np.full((bvh.order.shape[0],) + a.shape[1:], fill, a.dtype)
        mask = bvh.order >= 0
        out[mask] = a[bvh.order[mask]]
        return out

    pos_s = pick(pos)
    nor_s = pick(normals)
    uv_s = pick(texcoords)
    tan_s = pick(tangents)
    bit_s = pick(bitangents)
    inst_s = pick(inst.astype(np.int32))
    opaque_s = pick(opaque)

    packed = np.zeros((pos_s.shape[0], 12), np.float32)
    packed[:, 0:3] = pos_s[:, 0]
    packed[:, 3:6] = pos_s[:, 1] - pos_s[:, 0]
    packed[:, 6:9] = pos_s[:, 2] - pos_s[:, 0]
    packed[:, 9] = opaque_s.astype(np.float32)
    flat_packed = packed
    packed = packed.reshape(bvh.n_pad_leaves, leaf_size, 12)

    # --- coarse march pack: top-down binned-SAH chunking.
    # Chunk membership is decoupled from the Morton/BVH order (channel 10
    # of each packed row carries the GLOBAL sorted-array prim index, read
    # back by the march winner extraction), so chunks can be spatially
    # tight.  Measured on 192x108 camera primaries, mean chunks entered
    # per ray vs the round-1 fixed Morton-order groups: matpreview
    # 17.5 -> 6.5, classroom 19.4 -> 5.9 (max 66 -> 21) — march
    # iterations scale with exactly this count.  This is csrt's binned
    # SAH object split (bvh_builder.cpp) re-targeted at the flat chunk
    # granularity a TPU dense cull wants, instead of per-node.
    # sorted-slot tri bounds / centroids (real prims = slots [0, p))
    sv0 = pos_s[:p, 0]
    sv1 = pos_s[:p, 1]
    sv2 = pos_s[:p, 2]
    s_min = np.minimum(np.minimum(sv0, sv1), sv2)
    s_max = np.maximum(np.maximum(sv0, sv1), sv2)
    s_cent = 0.5 * (s_min + s_max)
    import os

    # Default chunk size: swept end-to-end on the chip (r4).  Scenes up
    # to 64k prims run fastest at 256-tri chunks (dragon [51k prims]
    # 25.9 -> 28.5, conductor [62k] 1.95 -> 2.46, dielectric -> 2.05
    # Mrays/s): fewer, fatter chunks amortize the per-chunk selection +
    # DMA bookkeeping in the march loop.  Larger scenes keep the
    # 64-start doubling rule — classroom (104k prims, doubling lands on
    # 128) measured 0.86 at 128 vs 0.73 at a forced 256; dining-room
    # (270k) lands on 256 either way.
    default_leaf = 256 if p <= (1 << 16) else 64
    march_leaf = int(os.environ.get("MCPT_MARCH_LEAF", default_leaf))
    max_chunks = int(os.environ.get("MCPT_MARCH_MAX_CHUNKS", 2048))
    chunks = _sah_chunks(s_cent, s_min, s_max, march_leaf)
    while len(chunks) > max_chunks:
        march_leaf *= 2
        chunks = _sah_chunks(s_cent, s_min, s_max, march_leaf)
    n_march = len(chunks)
    march_tris = np.zeros((n_march, march_leaf, 12), np.float32)
    march_min = np.full((n_march, 3), 3.0e37, np.float32)  # empty = far point
    march_max = np.full((n_march, 3), 3.0e37, np.float32)
    chunk_of_prim = np.zeros(pos_s.shape[0], np.int32)  # padding prims -> 0
    for j, ix in enumerate(chunks):
        rows = flat_packed[ix]
        rows[:, 10] = ix.astype(np.float32)  # global prim id (exact < 2^24)
        march_tris[j, : ix.size] = rows
        march_min[j] = s_min[ix].min(axis=0)
        march_max[j] = s_max[ix].max(axis=0)
        chunk_of_prim[ix] = j

    return Geometry(
        p0=jnp.asarray(pos_s[:, 0]),
        e1=jnp.asarray(pos_s[:, 1] - pos_s[:, 0]),
        e2=jnp.asarray(pos_s[:, 2] - pos_s[:, 0]),
        n0=jnp.asarray(nor_s[:, 0]),
        n1=jnp.asarray(nor_s[:, 1]),
        n2=jnp.asarray(nor_s[:, 2]),
        tg0=jnp.asarray(tan_s[:, 0]),
        tg1=jnp.asarray(tan_s[:, 1]),
        tg2=jnp.asarray(tan_s[:, 2]),
        bt0=jnp.asarray(bit_s[:, 0]),
        bt1=jnp.asarray(bit_s[:, 1]),
        bt2=jnp.asarray(bit_s[:, 2]),
        uv0=jnp.asarray(uv_s[:, 0]),
        uv1=jnp.asarray(uv_s[:, 1]),
        uv2=jnp.asarray(uv_s[:, 2]),
        inst_id=jnp.asarray(inst_s),
        opaque=jnp.asarray(opaque_s),
        node_min=jnp.asarray(bvh.node_min),
        node_max=jnp.asarray(bvh.node_max),
        packed_tris=jnp.asarray(packed),
        march_tris=jnp.asarray(march_tris),
        march_min=jnp.asarray(march_min),
        march_max=jnp.asarray(march_max),
        n_pad_leaves=bvh.n_pad_leaves,
        leaf_size=bvh.leaf_size,
        depth=bvh.depth,
        n_real_prims=p,
        n_march_leaves=n_march,
        march_leaf=march_leaf,
        march_chunk_of_prim=jnp.asarray(chunk_of_prim),
    )
