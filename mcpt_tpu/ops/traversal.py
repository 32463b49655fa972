"""Wavefront BVH traversal (csrt src/rtcore/accel/tlas.cpp, blas.cpp).

The reference walks a pointer-linked LBVH with a per-thread stack of 65
(tlas.cpp:18-43).  Here the whole wavefront traverses an *implicit*
binary tree together inside one `lax.while_loop`: each ray pops one node
per iteration from its own stack column, children are `2i+1 / 2i+2` (no
topology gathers), and leaf hits shrink `t_best` so later AABB tests
prune.  Lanes with empty stacks idle until every lane finishes — ray
batches are Morton-coherent (pixel order), which keeps divergence low.

Closest-hit and any-hit variants share the body; any-hit clears the
stack pointer on the first confirmed hit (early out, tlas.cpp:44-76).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from mcpt_tpu.ops.intersect import intersect_aabb, intersect_triangle, safe_rcp


class GeomHit(NamedTuple):
    """Raw geometric hit record (pre-interpolation)."""

    valid: jnp.ndarray    # [N] bool
    t: jnp.ndarray        # [N] float32
    prim: jnp.ndarray     # [N] int32 index into the sorted/padded prim SoA
    v: jnp.ndarray        # [N] barycentric weight of vertex 1
    w: jnp.ndarray        # [N] barycentric weight of vertex 2
    inside: jnp.ndarray   # [N] bool — hit the back face (det < 0)


def _leaf_intersect(geom, o, d, t_min, best, base, leaf_size, any_hit):
    """Test `leaf_size` consecutive sorted prims starting at `base`.

    Shadow (any-hit) queries skip non-opaque prims — null-boundary
    medium shells never occlude."""
    t_best, prim_best, v_best, w_best, in_best, valid = best
    for k in range(leaf_size):
        pid = base + k
        p0 = geom.p0[pid]
        e1 = geom.e1[pid]
        e2 = geom.e2[pid]
        hit, t, v, w, det_inv = intersect_triangle(o, d, p0, e1, e2, t_min, t_best)
        take = hit
        if any_hit:
            take = take & geom.opaque[pid]
        t_best = jnp.where(take, t, t_best)
        prim_best = jnp.where(take, pid, prim_best)
        v_best = jnp.where(take, v, v_best)
        w_best = jnp.where(take, w, w_best)
        in_best = jnp.where(take, det_inv < 0.0, in_best)
        valid = valid | take
    return t_best, prim_best, v_best, w_best, in_best, valid


def _traverse(geom, o, d, t_min, t_max, any_hit: bool):
    """Per-lane-stack wavefront traversal.

    The stack lives as [stack_size, N] and is read/written with one-hot
    masks over the (small, static) stack axis instead of per-lane
    gather/scatter — dense VPU selects instead of serialized scatters."""
    n = o.shape[0]
    n_pad_leaves = geom.n_pad_leaves
    leaf_size = geom.leaf_size
    first_leaf = n_pad_leaves - 1
    stack_size = geom.depth + 2
    d_rcp = safe_rcp(d)
    slot_iota = jnp.arange(stack_size)[:, None]  # [S, 1]

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    stack0 = jnp.zeros((stack_size, n), jnp.int32)
    sp0 = jnp.ones((n,), jnp.int32)  # root pushed
    best0 = (
        t_max,
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.bool_),
        jnp.zeros((n,), jnp.bool_),
    )

    def cond(state):
        _, sp, _ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = jnp.sum(
            jnp.where(slot_iota == top[None, :], stack, 0), axis=0
        )
        sp = jnp.where(active, sp - 1, sp)

        is_leaf = node >= first_leaf
        do_leaf = active & is_leaf
        do_int = active & ~is_leaf

        # --- leaf: intersect primitives; padding prims have zero edges
        base = (node - first_leaf) * leaf_size
        leaf_best = _leaf_intersect(
            geom, o, d, t_min, best, jnp.where(do_leaf, base, 0), leaf_size,
            any_hit,
        )
        best = tuple(jnp.where(do_leaf, lb, b) for lb, b in zip(leaf_best, best))
        if any_hit:
            # first hit terminates the lane
            sp = jnp.where(best[5], 0, sp)

        # --- internal: test children, push far then near
        c0 = 2 * node + 1
        c1 = 2 * node + 2
        t_cull = best[0]
        h0, t0 = intersect_aabb(o, d_rcp, geom.node_min[c0], geom.node_max[c0], t_min, t_cull)
        h1, t1 = intersect_aabb(o, d_rcp, geom.node_min[c1], geom.node_max[c1], t_min, t_cull)
        h0 = h0 & do_int
        h1 = h1 & do_int
        both = h0 & h1
        near_is_0 = t0 <= t1
        near = jnp.where(near_is_0, c0, c1)
        far = jnp.where(near_is_0, c1, c0)
        first = jnp.where(both, far, jnp.where(h0, c0, c1))
        push1 = h0 | h1
        push2 = both

        slot = jnp.minimum(sp, stack_size - 1)
        stack = jnp.where(
            (slot_iota == slot[None, :]) & push1[None, :], first[None, :], stack
        )
        sp = sp + push1.astype(jnp.int32)
        slot = jnp.minimum(sp, stack_size - 1)
        stack = jnp.where(
            (slot_iota == slot[None, :]) & push2[None, :], near[None, :], stack
        )
        sp = sp + push2.astype(jnp.int32)

        return stack, sp, best

    _, _, best = lax.while_loop(cond, body, (stack0, sp0, best0))
    t_best, prim_best, v_best, w_best, in_best, valid = best
    return GeomHit(valid=valid, t=t_best, prim=prim_best, v=v_best, w=w_best, inside=in_best)


# Scenes at or below this many (padded) primitives skip the BVH and use
# the dense chunked sweep — on a TPU the fully-vectorized VPU sweep beats
# the gather-heavy serial tree walk far beyond typical "small" sizes.
DENSE_MAX_PRIMS = 16384
_DENSE_CHUNK = 512


def _intersect_dense(geom, o, d, t_min, t_max, any_hit: bool):
    """Chunked all-primitives sweep: lax.scan over triangle blocks, each
    block tested densely [N, C] and min-reduced.  No gathers, no
    per-lane control flow — pure VPU work."""
    n = o.shape[0]
    p = geom.p0.shape[0]
    chunk = min(_DENSE_CHUNK, p)
    n_chunks = -(-p // chunk)  # p is a power-of-two multiple of leaf_size
    pad = n_chunks * chunk

    def pad_tris(a):
        if pad == p:
            return a.reshape(n_chunks, chunk, 3)
        ext = jnp.zeros((pad - p, 3), a.dtype)
        return jnp.concatenate([a, ext]).reshape(n_chunks, chunk, 3)

    p0c = pad_tris(geom.p0)
    e1c = pad_tris(geom.e1)
    e2c = pad_tris(geom.e2)
    if any_hit:
        op = geom.opaque
        opc = (
            jnp.concatenate([op, jnp.zeros(pad - p, jnp.bool_)])
            if pad != p
            else op
        ).reshape(n_chunks, chunk)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    best0 = (
        t_max.astype(jnp.float32),
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.bool_),
        jnp.zeros((n,), jnp.bool_),
    )

    def body(best, chunk_idx):
        t_best, prim_best, v_best, w_best, in_best, valid = best
        base = chunk_idx * chunk
        hit, t, v, w, det_inv = intersect_triangle(
            o[:, None, :],
            d[:, None, :],
            p0c[chunk_idx][None],
            e1c[chunk_idx][None],
            e2c[chunk_idx][None],
            t_min[:, None],
            t_best[:, None],
        )
        if any_hit:
            hit = hit & opc[chunk_idx][None]
        t = jnp.where(hit, t, jnp.inf)
        # winner extraction WITHOUT per-lane gathers (TPU gathers
        # serialize): min-reduce t, recover the winning column by a
        # masked-iota min, then one-hot sum the attributes — all dense
        # VPU reductions.
        tk = jnp.min(t, axis=1)
        take = jnp.isfinite(tk) & (tk < t_best)
        iota_c = lax.broadcasted_iota(jnp.int32, t.shape, 1)
        k = jnp.min(
            jnp.where(t == tk[:, None], iota_c, jnp.int32(2**30)), axis=1
        )
        one_hot = iota_c == k[:, None]
        vk = jnp.sum(jnp.where(one_hot, v, 0.0), axis=1)
        wk = jnp.sum(jnp.where(one_hot, w, 0.0), axis=1)
        dk = jnp.sum(jnp.where(one_hot, det_inv, 0.0), axis=1)
        return (
            jnp.where(take, tk, t_best),
            jnp.where(take, base + k, prim_best),
            jnp.where(take, vk, v_best),
            jnp.where(take, wk, w_best),
            jnp.where(take, dk < 0, in_best),
            valid | take,
        ), None

    best, _ = lax.scan(body, best0, jnp.arange(n_chunks))
    t_best, prim_best, v_best, w_best, in_best, valid = best
    return GeomHit(valid=valid, t=t_best, prim=prim_best, v=v_best,
                   w=w_best, inside=in_best)


def _intersect_march(geom, o, d, t_min, t_max, any_hit: bool):
    """Leaf-march traversal for large scenes: per-lane nearest-chunk-
    first processing with best-t pruning, fully vectorized — no stacks,
    no block serialization.

    The scene's Morton-sorted prims are pre-grouped into ~<=2048
    coherent chunks with AABBs (geometry.march_*).  One dense
    [rays x chunks] slab test yields every lane's candidate entry
    distances; then a `while_loop` repeatedly takes each lane's nearest
    unprocessed chunk (argmin — every lane advances independently every
    iteration, unlike a packet traversal where a block serializes on the
    union of its lanes' subtrees), sweeps that chunk's triangles, and
    masks it off.  Nearest-first means a found hit prunes all farther
    chunks, so iterations ~ the ray's depth complexity, not tree size.
    Replaces csrt's per-thread stackful TLAS walk (tlas.cpp:13-76)."""
    from mcpt_tpu.ops.intersect import intersect_aabb, safe_rcp

    n = o.shape[0]
    lm = geom.n_march_leaves
    lane = jnp.arange(n)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    d_rcp = safe_rcp(d)
    hit_c, t_enter = intersect_aabb(
        o[:, None, :],
        d_rcp[:, None, :],
        geom.march_min[None, :, :],
        geom.march_max[None, :, :],
        t_min[:, None],
        t_max[:, None],
    )  # [N, Lm]
    # 1e30 cap: padding chunks are parked at 3e37 point AABBs
    # (geometry.py) whose entry distances are finite — drop them so
    # all-miss lanes don't march through padding
    t_enter = jnp.where(
        hit_c & (t_enter < 1e30), jnp.maximum(t_enter, 0.0), jnp.inf
    )

    best0 = (
        t_max,
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.bool_),
        jnp.zeros((n,), jnp.bool_),
    )

    def cond(state):
        t_enter, best = state
        t_best = best[0]
        done = best[5] if any_hit else jnp.zeros((n,), jnp.bool_)
        return jnp.any(~done & (jnp.min(t_enter, axis=1) < t_best))

    def body(state):
        t_enter, best = state
        t_best, prim_best, v_best, w_best, in_best, valid = best

        li = jnp.argmin(t_enter, axis=1)                     # [N]
        te = t_enter[lane, li]
        active = te < t_best
        if any_hit:
            active = active & ~valid

        rows = geom.march_tris[li]                           # [N, ls, 12]
        hit, t, v, w, det_inv = intersect_triangle(
            o[:, None, :],
            d[:, None, :],
            rows[..., 0:3],
            rows[..., 3:6],
            rows[..., 6:9],
            t_min[:, None],
            t_best[:, None],
        )
        if any_hit:
            hit = hit & (rows[..., 9] > 0.5)
        hit = hit & active[:, None]
        t = jnp.where(hit, t, jnp.inf)
        # min + one-hot winner extraction (no per-lane gathers)
        tk = jnp.min(t, axis=1)
        take = jnp.isfinite(tk) & (tk < t_best)
        iota_c = lax.broadcasted_iota(jnp.int32, t.shape, 1)
        k = jnp.min(
            jnp.where(t == tk[:, None], iota_c, jnp.int32(2**30)), axis=1
        )
        one_hot = iota_c == k[:, None]
        vk = jnp.sum(jnp.where(one_hot, v, 0.0), axis=1)
        wk = jnp.sum(jnp.where(one_hot, w, 0.0), axis=1)
        dk = jnp.sum(jnp.where(one_hot, det_inv, 0.0), axis=1)
        # channel 10 carries the GLOBAL prim id (chunk membership is a
        # median-split order, not the sorted-array order — geometry.py)
        pk = jnp.sum(jnp.where(one_hot, rows[..., 10], 0.0), axis=1)

        best = (
            jnp.where(take, tk, t_best),
            jnp.where(take, pk.astype(jnp.int32), prim_best),
            jnp.where(take, vk, v_best),
            jnp.where(take, wk, w_best),
            jnp.where(take, dk < 0, in_best),
            valid | take,
        )
        # mask the processed chunk (lanes already finished keep theirs
        # masked-by-best-t anyway, but clearing is what guarantees the
        # loop terminates)
        t_enter = jnp.where(
            (jnp.arange(lm)[None, :] == li[:, None]), jnp.inf, t_enter
        )
        return t_enter, best

    _, best = lax.while_loop(cond, body, (t_enter, best0))
    t_best, prim_best, v_best, w_best, in_best, valid = best
    return GeomHit(valid=valid, t=t_best, prim=prim_best, v=v_best,
                   w=w_best, inside=in_best)


PACKET_BLOCK = 1024  # rays per packet (8 x 128 VPU tiles)


def _morton10(x):
    """Interleave the low 10 bits of uint32 lanes 3 apart."""
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0xFF0000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0F00F00F)
    x = (x | (x << 4)) & jnp.uint32(0xC30C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x49249249)
    return x


def _ray_sort_keys(geom, o, d, mode: str | None = None, coherence=None):
    """Coherence keys so ray blocks share chunks/subtrees (the reference
    Morton-orders its CPU patches for the same reason,
    renderer.cpp:24-60).  Modes (MCPT_MARCH_SORT):

    * ``octori`` — direction octant (high bits) then 21-bit Morton of
      the origin inside the scene bounds.
    * ``dirori`` — interleaved direction Morton (12 bits, high) then
      origin Morton (15 bits): the wavefront inside the render loop
      mixes camera/bounce/shadow rays whose ORIGINS cluster but whose
      directions span the sphere; direction-major keys keep a block's
      chunk-corridor union small.

    ``coherence``: optional [N] int32, the SAH chunk index the ray's
    origin lies in (-1 = unknown).  Lanes with a chunk use a chunk-major
    key — chunk id (11 bits), direction octant (3), origin Morton (15) —
    so blocks align with the march partition itself: rays that START in
    the same chunk share the near end of their corridors, which is where
    nearest-first pruning concentrates the work (r5 measurement:
    conductor 2.94 -> see docs/PERF.md).

    Bit budget: every geometric key fits bits 0-27 (asserted by masking
    below); the wrapper ORs the two-bit coherence CLASS at bits 28-29
    (camera=0 / bounce=1 / shadow=2 — the batched trace mixes all three
    in one call, and a one-bit class measured ~7-9% slower on dragon /
    dining because shadow and bounce corridors merged into the same
    blocks) and the dead-lane bit at 30 on top.  A future mode must
    stay inside 28 bits or block packing silently degrades (ADVICE r4).
    """
    import os

    if mode is None:
        mode = os.environ.get("MCPT_MARCH_SORT", "octori")
    lo = geom.node_min[0]
    hi = geom.node_max[0]
    span = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((o - lo) / span, 0.0, 1.0)
    qi = (q * 1023.0).astype(jnp.uint32)
    morton = (
        (_morton10(qi[..., 0]) << 2)
        | (_morton10(qi[..., 1]) << 1)
        | _morton10(qi[..., 2])
    )
    geo_mask = jnp.uint32((1 << 28) - 1)  # 28-bit geometric-key budget
    if mode == "dirori":
        dq = jnp.clip((d + 1.0) * 0.5, 0.0, 1.0)
        di = (dq * 15.0).astype(jnp.uint32)  # 4 bits/axis
        dmorton = (
            (_morton10(di[..., 0]) << 2)
            | (_morton10(di[..., 1]) << 1)
            | _morton10(di[..., 2])
        )  # 12 significant bits
        keys = ((dmorton << 14) | (morton >> 16)) & geo_mask
    elif mode == "octdir":
        # 2 bits per axis of direction (sign + coarse magnitude), then
        # origin Morton — halves a block's direction cone vs `octori`
        # while keeping most origin locality
        dq = jnp.clip((d + 1.0) * 0.5, 0.0, 1.0)
        di = (dq * 3.999).astype(jnp.uint32)  # 2 bits/axis
        dir6 = (di[..., 0] << 4) | (di[..., 1] << 2) | di[..., 2]
        keys = ((dir6 << 22) | (morton >> 8)) & geo_mask
    else:
        octant = (
            (d[..., 0] >= 0).astype(jnp.uint32) * 4
            + (d[..., 1] >= 0).astype(jnp.uint32) * 2
            + (d[..., 2] >= 0).astype(jnp.uint32)
        )
        # keep keys in the 28-bit budget: octant(3) + morton>>5 (25)
        keys = ((octant << 25) | (morton >> 5)) & geo_mask
    if coherence is not None:
        coh = jnp.asarray(coherence, jnp.int32)
        octant = (
            (d[..., 0] >= 0).astype(jnp.uint32) * 4
            + (d[..., 1] >= 0).astype(jnp.uint32) * 2
            + (d[..., 2] >= 0).astype(jnp.uint32)
        )
        ck = (
            (jnp.clip(coh, 0, 2047).astype(jnp.uint32) << 17)
            | (octant << 14)
            | (morton >> 16)
        ) & geo_mask
        keys = jnp.where(coh >= 0, ck, keys)
    return keys.astype(jnp.int32)


def _intersect_packet(geom, o, d, t_min, t_max, any_hit: bool):
    """Packet BVH traversal: one SCALAR stack per ray block, vector
    AABB/triangle tests over the block, node/leaf fetches by scalar
    `dynamic_slice` — zero gathers, so every memory access is a dense
    tile load (the TPU-native replacement for per-lane stacks; ray
    blocks are Morton-coherent so the union of visited nodes stays
    small).  `lax.map` runs the blocks sequentially; each block only
    does its own work."""
    n = o.shape[0]
    block = min(PACKET_BLOCK, max(n, 1))
    g_blocks = -(-n // block)
    pad = g_blocks * block

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    # sort lanes by coherence key so each packet shares BVH subtrees;
    # results are scattered back through the inverse permutation
    order = jnp.argsort(_ray_sort_keys(geom, o, d))
    o = o[order]
    d = d[order]
    t_min = t_min[order]
    t_max = t_max[order]

    def pad_to(a, fill=0.0):
        if pad == n:
            return a
        ext_shape = (pad - n,) + a.shape[1:]
        return jnp.concatenate([a, jnp.full(ext_shape, fill, a.dtype)])

    ob = pad_to(o).reshape(g_blocks, block, 3)
    db = pad_to(d).reshape(g_blocks, block, 3)
    tminb = pad_to(t_min).reshape(g_blocks, block)
    tmaxb = pad_to(t_max, fill=0.0).reshape(g_blocks, block)  # pad rays dead

    first_leaf = geom.n_pad_leaves - 1
    leaf_size = geom.leaf_size
    stack_size = geom.depth + 2
    # packed leaf triangles [n_pad_leaves, leaf_size, 12]
    tris = geom.packed_tris
    nodes_min = geom.node_min
    nodes_max = geom.node_max

    def run_block(args):
        o, d, t_min, t_max = args
        d_rcp = safe_rcp(d)

        stack0 = jnp.zeros((stack_size,), jnp.int32)
        best0 = (
            t_max,
            jnp.zeros((block,), jnp.int32),
            jnp.zeros((block,), jnp.float32),
            jnp.zeros((block,), jnp.float32),
            jnp.zeros((block,), jnp.bool_),
            jnp.zeros((block,), jnp.bool_),
        )

        def cond(state):
            _, sp, _ = state
            return sp > 0

        def body(state):
            stack, sp, best = state
            node = lax.dynamic_index_in_dim(stack, sp - 1, keepdims=False)
            sp = sp - 1

            is_leaf = node >= first_leaf

            def do_leaf(best):
                t_best, prim_best, v_best, w_best, in_best, valid = best
                base = (node - first_leaf) * leaf_size
                leaf = lax.dynamic_slice_in_dim(
                    tris, node - first_leaf, 1, axis=0
                )[0]  # [leaf_size, 12]
                # dense [block, leaf_size] test
                p0 = leaf[None, :, 0:3]
                e1 = leaf[None, :, 3:6]
                e2 = leaf[None, :, 6:9]
                opq = leaf[None, :, 9] > 0.5
                hit, t, v, w, det_inv = intersect_triangle(
                    o[:, None, :], d[:, None, :], p0, e1, e2,
                    t_min[:, None], t_best[:, None],
                )
                if any_hit:
                    hit = hit & opq
                t = jnp.where(hit, t, jnp.inf)
                tk = jnp.min(t, axis=1)
                take = jnp.isfinite(tk) & (tk < t_best)
                iota_c = lax.broadcasted_iota(jnp.int32, t.shape, 1)
                k = jnp.min(
                    jnp.where(t == tk[:, None], iota_c, jnp.int32(2**30)),
                    axis=1,
                )
                one_hot = iota_c == k[:, None]
                vk = jnp.sum(jnp.where(one_hot, v, 0.0), axis=1)
                wk = jnp.sum(jnp.where(one_hot, w, 0.0), axis=1)
                dk = jnp.sum(jnp.where(one_hot, det_inv, 0.0), axis=1)
                return (
                    jnp.where(take, tk, t_best),
                    jnp.where(take, base + k, prim_best),
                    jnp.where(take, vk, v_best),
                    jnp.where(take, wk, w_best),
                    jnp.where(take, dk < 0, in_best),
                    valid | take,
                )

            best_leaf = do_leaf(best)
            best = tuple(
                jnp.where(is_leaf, bl, b) for bl, b in zip(best_leaf, best)
            )

            # internal node: vector AABB tests for both children,
            # scalar push decisions from any-lane reductions
            c0 = 2 * node + 1
            c1 = 2 * node + 2
            live = t_min < best[0]
            if any_hit:
                live = live & ~best[5]
            bmin0 = lax.dynamic_slice_in_dim(nodes_min, c0, 2, axis=0)
            bmax0 = lax.dynamic_slice_in_dim(nodes_max, c0, 2, axis=0)
            h0, t0 = intersect_aabb(
                o, d_rcp, bmin0[0][None, :], bmax0[0][None, :], t_min, best[0]
            )
            h1, t1 = intersect_aabb(
                o, d_rcp, bmin0[1][None, :], bmax0[1][None, :], t_min, best[0]
            )
            h0 = h0 & live
            h1 = h1 & live
            any0 = jnp.any(h0)
            any1 = jnp.any(h1)
            # near-child ordering by mean entry distance over hitting lanes
            m0 = jnp.sum(jnp.where(h0, t0, 0.0)) / jnp.maximum(
                jnp.sum(h0.astype(jnp.float32)), 1.0
            )
            m1 = jnp.sum(jnp.where(h1, t1, 0.0)) / jnp.maximum(
                jnp.sum(h1.astype(jnp.float32)), 1.0
            )
            near_is_0 = m0 <= m1
            near = jnp.where(near_is_0, c0, c1)
            far = jnp.where(near_is_0, c1, c0)
            any_near = jnp.where(near_is_0, any0, any1)
            any_far = jnp.where(near_is_0, any1, any0)

            do_int = ~is_leaf
            push_first = do_int & (any0 | any1)
            first = jnp.where(any_near & any_far, far,
                              jnp.where(any_near, near, far))
            stack = lax.dynamic_update_index_in_dim(
                stack, jnp.where(push_first, first, stack[jnp.minimum(sp, stack_size - 1)]),
                jnp.minimum(sp, stack_size - 1), axis=0,
            )
            sp = sp + jnp.where(push_first, 1, 0)
            push_second = do_int & any_near & any_far
            stack = lax.dynamic_update_index_in_dim(
                stack, jnp.where(push_second, near, stack[jnp.minimum(sp, stack_size - 1)]),
                jnp.minimum(sp, stack_size - 1), axis=0,
            )
            sp = sp + jnp.where(push_second, 1, 0)
            return stack, sp, best

        _, _, best = lax.while_loop(cond, body, (stack0, jnp.int32(1), best0))
        return best

    best = lax.map(run_block, (ob, db, tminb, tmaxb))
    inverse = jnp.argsort(order)
    t_best, prim_best, v_best, w_best, in_best, valid = (
        x.reshape(pad)[:n][inverse] for x in best
    )
    return GeomHit(valid=valid, t=t_best, prim=prim_best, v=v_best,
                   w=w_best, inside=in_best)


def _zero_tangent(x):
    """Zero tangent with the float0 convention for integer/bool leaves."""
    import numpy as np
    from jax import dtypes

    if jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, dtypes.float0)


def _detached(fn):
    """Mark a while_loop-based traversal as a path-space constant.

    The march/packet traversals iterate a `lax.while_loop`, which
    reverse-mode AD cannot transpose — without this, any scene past
    DENSE_MAX_PRIMS cannot be differentiated at all.  Detaching the hit
    record is the standard detached-sampling estimator: gradients of
    shading parameters (textures, BSDF scalars, emitters, media) flow
    through the throughput/radiance products along the FIXED sampled
    path, while the geometric dependence of the path itself is dropped
    (the dense sweep keeps it; geometry is not in the gradient set
    either way — parallel.shard.PARAM_FAMILIES)."""
    import jax

    f = jax.custom_jvp(fn)

    @f.defjvp
    def _jvp(primals, tangents):
        out = fn(*primals)
        return out, jax.tree.map(_zero_tangent, out)

    return f


def _large_strategy() -> str:
    """Large-scene (> DENSE_MAX_PRIMS) traversal: 'auto' (default),
    'march' (block march, see _intersect_march_pallas), 'pairs'
    (pair-scheduled kernel, see _intersect_pairs) or 'packet'
    (the block-stack traversal).  MCPT_TRAVERSAL overrides."""
    import os

    return os.environ.get("MCPT_TRAVERSAL", "auto")


def resolved_strategy(geom) -> str:
    """The traversal a given geometry actually uses ('auto' resolved).

    Auto routing, measured r5 (512^2@16spp d8, one v5e): the pair
    kernel wins where block corridor UNIONS dwarf per-ray corridors —
    classroom (1335 x 128-tri chunks): 1.26 vs 1.02 Mrays/s — while the
    block march wins everywhere chunks are fat (256-tri: matpreview
    3.2-3.3, dragon 26, dining 1.48 vs pairs 2.6/12/0.5).  A small
    march_leaf is the commit-time signature of that regime (chunk
    doubling landed small => many thin chunks => wide unions), so auto
    = pairs iff march_leaf < 256."""
    s = _large_strategy()
    if s != "auto":
        return s
    return "pairs" if geom.march_leaf < 256 else "march"


_march_closest = _detached(
    lambda geom, o, d, t_min, t_max: _intersect_march(
        geom, o, d, t_min, t_max, any_hit=False
    )
)
_march_any = _detached(
    lambda geom, o, d, t_min, t_max: _intersect_march(
        geom, o, d, t_min, t_max, any_hit=True
    )
)
_packet_closest = _detached(
    lambda geom, o, d, t_min, t_max: _intersect_packet(
        geom, o, d, t_min, t_max, any_hit=False
    )
)
_packet_any = _detached(
    lambda geom, o, d, t_min, t_max: _intersect_packet(
        geom, o, d, t_min, t_max, any_hit=True
    )
)


def _use_pallas_dense() -> bool:
    """Pallas dense sweep is OPT-IN (MCPT_PALLAS_DENSE=1): the axon
    remote Mosaic compiler hangs >25 min on this kernel (round-1
    measurement), so auto-routing would stall production renders.  The
    kernel itself is correct (interpret-mode equivalence test)."""
    import os

    return os.environ.get("MCPT_PALLAS_DENSE") == "1"


def _intersect_dense_pallas(geom, o, d, t_min, t_max, any_hit, interpret=False):
    """VMEM-resident Pallas sweep (ops.pallas_dense)."""
    from mcpt_tpu.ops.pallas_dense import RAY_BLOCK, dense_sweep

    n = o.shape[0]
    r = RAY_BLOCK
    g = -(-n // r)
    pad = g * r
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    def pad1(a, fill=0.0):
        return (
            a if pad == n
            else jnp.concatenate([a, jnp.full((pad - n,), fill, a.dtype)])
        )

    rays = jnp.stack(
        [
            pad1(o[:, 0]), pad1(o[:, 1]), pad1(o[:, 2]),
            pad1(d[:, 0]), pad1(d[:, 1]), pad1(d[:, 2], fill=1.0),
            pad1(t_min), pad1(t_max, fill=0.0),
        ]
    ).reshape(8, g, r).swapaxes(0, 1)  # [G, 8, R]

    p = geom.p0.shape[0]
    tris_t = geom.packed_tris.reshape(p, 12).T  # [12, P]

    t, prim, v, w, flags = dense_sweep(
        rays, tris_t, any_hit=any_hit, interpret=interpret
    )
    t = t.reshape(pad)[:n]
    prim = prim.reshape(pad)[:n]
    v = v.reshape(pad)[:n]
    w = w.reshape(pad)[:n]
    flags = flags.reshape(pad)[:n]
    return GeomHit(
        valid=flags >= 2.0,
        t=t,
        prim=prim,
        v=v,
        w=w,
        inside=(flags % 2.0) >= 1.0,
    )


def _use_pallas_march() -> bool:
    """Pallas march kernel for large scenes: DEFAULT on TPU backends
    (proven on-chip round 2: bit-exact vs the XLA march and 2.5-5.6x
    faster at 64k-256k rays, scripts/pallas_march_bench.py), opt-out
    with MCPT_PALLAS_MARCH=0; opt-in elsewhere with =1 (CPU tests use
    interpret-mode equivalence instead)."""
    import os

    flag = os.environ.get("MCPT_PALLAS_MARCH")
    if flag is not None:
        return flag == "1"
    import jax

    return jax.default_backend() == "tpu"


def _intersect_march_pallas(geom, o, d, t_min, t_max, any_hit,
                            interpret=False, sort_bias=None,
                            coherence=None):
    """Block-local VMEM march (ops.pallas_march).  Rays are sorted by
    direction-octant + origin-Morton keys so each RAY_BLOCK shares
    chunks (same coherence argument as _intersect_packet).

    `sort_bias`: optional [N] int32 coherence-CLASS key prepended (two
    bits at 28-29) above the geometric key — the regen wavefront passes
    camera=0 / bounce=1 / shadow=2 so freshly regenerated camera rays
    (one origin, narrow cone) never share a block with divergent bounce
    continuations or light-directed shadow segments; a mixed block
    marches the UNION of its rays' chunk corridors (docs/PERF.md: ~56
    chunks mixed vs ~7 coherent).

    `coherence`: optional [N] int32 origin chunk id (-1 unknown) — see
    _ray_sort_keys."""
    from mcpt_tpu.ops.pallas_march import CHUNK_TILE, march_sweep, ray_block

    n = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    # masked lanes (t_max <= t_min: NEE geo-fail, dead wavefront slots)
    # sort LAST so they pack into blocks whose phase-B bound is zero —
    # interleaved they dilute live blocks, which still march their full
    # chunk union for fewer useful lanes
    keys = _ray_sort_keys(geom, o, d, coherence=coherence) | jnp.where(
        t_max <= t_min, jnp.int32(1 << 30), jnp.int32(0)
    )
    if sort_bias is not None:
        # two-bit coherence class at bits 28-29 (see _ray_sort_keys)
        keys = keys | (jnp.asarray(sort_bias, jnp.int32) << 28)
    # ONE variadic sort carries the key, the recovered permutation (the
    # iota operand), and all eight ray columns — replacing argsort plus
    # a chain of per-lane gathers (a TPU gather at 64k lanes costs
    # ~0.85-1.3 ms EACH, docs/PERF.md r3; the permutation machinery was
    # costing more than the march kernel itself on dragon)
    _, order, o0, o1, o2, d0, d1, d2, tmin_s, tmax_s = lax.sort(
        (keys, jnp.arange(n, dtype=jnp.int32),
         o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         t_min, t_max),
        dimension=0, num_keys=1, is_stable=False,
    )

    r = ray_block(geom.n_real_prims)
    g = -(-n // r)
    pad = g * r

    def pad1(a, fill=0.0):
        return (
            a if pad == n
            else jnp.concatenate([a, jnp.full((pad - n,), fill, a.dtype)])
        )

    rays = jnp.stack(
        [
            pad1(o0), pad1(o1), pad1(o2),
            pad1(d0), pad1(d1), pad1(d2, fill=1.0),
            pad1(tmin_s), pad1(tmax_s, fill=0.0),
        ]
    ).reshape(8, g, r).swapaxes(0, 1)  # [G, 8, R]

    lm = geom.n_march_leaves
    ls = geom.march_leaf
    lm_pad = -(-lm // CHUNK_TILE) * CHUNK_TILE

    def pad_c(a, fill):
        ext = jnp.full((lm_pad - lm,) + a.shape[1:], fill, a.dtype)
        return jnp.concatenate([a, ext]) if lm_pad != lm else a

    cmin = jnp.concatenate(
        [pad_c(geom.march_min, 3.0e37).T,
         jnp.zeros((1, lm_pad), jnp.float32)]
    )  # [4, Lm]
    cmax = jnp.concatenate(
        [pad_c(geom.march_max, 3.0e37).T,
         jnp.zeros((1, lm_pad), jnp.float32)]
    )
    tris = pad_c(geom.march_tris, 0.0)  # [Lm, ls, 12]
    # The per-chunk DMA extent must be whole (8, 128) f32 tiles: a
    # 128-unaligned lane dim fails the Mosaic verifier, and a sublane
    # dim that is not a multiple of 8 CRASHES the TPU worker at run
    # time (bisected by scripts/march_fault_probe.py: 12-row copy
    # faults, 16-row copy is fine).  Pad chunk size -> x128 with
    # degenerate rows and the 12 attribute rows -> 16.  The VPU runs
    # [R, 128]-lane tiles regardless, so the lane pad costs ~nothing.
    ls_pad = -(-ls // 128) * 128
    if ls_pad != ls:
        tris = jnp.concatenate(
            [tris, jnp.zeros((lm_pad, ls_pad - ls, 12), tris.dtype)], axis=1
        )
    tris = tris.swapaxes(1, 2)  # [Lm, 12, ls_pad]
    tris = jnp.concatenate(
        [tris, jnp.zeros((lm_pad, 4, ls_pad), tris.dtype)], axis=1
    )  # [Lm, 16, ls_pad]

    # MCPT_MARCH_IVAL=1: conservative block-summary phase A — exact same
    # hits, ~R x less cull work, but the looser bound makes low-coherence
    # blocks march many more chunks (measured 8-15x SLOWER on randomized
    # rays, scripts/pallas_march_bench.py) — opt-in only.
    import os

    from mcpt_tpu.ops.pallas_march import _use_super_cull

    t, prim, v, w, flags = march_sweep(
        rays, cmin, cmax, tris, any_hit=any_hit, interpret=interpret,
        interval=os.environ.get("MCPT_MARCH_IVAL", "0") == "1",
        super_cull=_use_super_cull(),
    )
    # inverse permutation = one variadic sort keyed on `order` (a
    # permutation of iota: no ties, deterministic) instead of
    # argsort + five per-lane gathers
    _, t, prim, v, w, flags = lax.sort(
        (order,) + tuple(x.reshape(pad)[:n] for x in (t, prim, v, w, flags)),
        dimension=0, num_keys=1, is_stable=False,
    )
    return GeomHit(
        valid=flags >= 2.0,
        t=t,
        prim=prim,
        v=v,
        w=w,
        inside=(flags % 2.0) >= 1.0,
    )


def _pair_tris_pack(geom):
    """[Lm, 16, ls_pad] chunk-triangle pack for the pair kernel: the
    march pack's 12 attribute rows padded to 16 and the chunk size
    padded to a 128 multiple so each per-chunk DMA is whole (8, 128)
    f32 tiles (pallas_march's extent rule; 12-row copies FAULT the
    chip — scripts/march_fault_probe.py)."""
    ls = geom.march_leaf
    ls_pad = -(-ls // 128) * 128
    tris = geom.march_tris  # [Lm, ls, 12]
    if ls_pad != ls:
        tris = jnp.concatenate(
            [tris, jnp.zeros((tris.shape[0], ls_pad - ls, 12), tris.dtype)],
            axis=1,
        )
    tris = tris.swapaxes(1, 2)  # [Lm, 12, ls_pad]
    return jnp.concatenate(
        [tris, jnp.zeros((tris.shape[0], 4, ls_pad), tris.dtype)], axis=1
    )  # [Lm, 16, ls_pad]


def _intersect_pairs(geom, o, d, t_min, t_max, any_hit, interpret=False):
    """Pair-scheduled traversal (ops.pallas_pairs): expand each ray into
    its corridor's (ray, chunk) pairs, sort pairs by chunk, sweep each
    chunk once against exactly the pairs that want it.  Removes the
    block march's corridor-UNION waste on divergent wavefronts (~6x on
    matpreview bounce/shadow rays — pallas_pairs docstring).

    Rays whose corridor exceeds the K pair slots (p99.9 tail: escaping
    diagonal rays) fall back to one mostly-dead block-march call whose
    live lanes carry ONLY those rays."""
    from mcpt_tpu.ops.pallas_pairs import (
        CORRIDOR_TILE, corridor_sweep, pair_block, pair_k, pair_sweep,
    )

    n = o.shape[0]
    lm = geom.n_march_leaves
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    live = t_max > t_min
    k = pair_k()

    # --- corridor extraction (Pallas kernel A: VMEM-resident slab +
    # K-pop, zero [N, Lm] HBM round-trips) -----------------------------
    r_a = 512
    g_a = -(-n // r_a)
    pad_a = g_a * r_a

    def pad1a(a, fill=0.0):
        return (
            a if pad_a == n
            else jnp.concatenate([a, jnp.full((pad_a - n,), fill, a.dtype)])
        )

    rays_a = jnp.stack(
        [
            pad1a(o[:, 0]), pad1a(o[:, 1]), pad1a(o[:, 2]),
            pad1a(d[:, 0]), pad1a(d[:, 1]), pad1a(d[:, 2], fill=1.0),
            pad1a(t_min), pad1a(t_max, fill=0.0),
        ]
    ).reshape(8, g_a, r_a).swapaxes(0, 1)  # [Ga, 8, Ra]
    lm_pad = -(-lm // CORRIDOR_TILE) * CORRIDOR_TILE

    def pad_cc(a):
        ext = jnp.full((lm_pad - lm, 3), 3.0e37, a.dtype)
        return jnp.concatenate([a, ext]) if lm_pad != lm else a

    out_a = corridor_sweep(
        rays_a, pad_cc(geom.march_min), pad_cc(geom.march_max), k=k,
        interpret=interpret,
    )  # [Ga, 16, Ra]
    slots = jnp.moveaxis(out_a[:, :k, :], 1, 2).reshape(pad_a, k)[:n]
    overflow = (out_a[:, k, :].reshape(pad_a)[:n] > 0.0) & live
    # overflow rays route ENTIRELY to the fallback: kill their pairs
    pc = jnp.where(
        overflow[:, None] | (slots >= lm), float(lm), slots
    ).astype(jnp.int32).reshape(n * k)

    def rep(a):
        return jnp.broadcast_to(a[:, None], (n, k)).reshape(n * k)

    dead = pc >= lm
    p_tmax = jnp.where(dead, 0.0, rep(t_max))
    # ONE variadic sort by chunk id (dead pairs = lm sort last); the
    # iota operand recovers the inverse permutation
    pc_s, order, o0, o1, o2, d0, d1, d2, tmin_s, tmax_s = lax.sort(
        (pc, jnp.arange(n * k, dtype=jnp.int32),
         rep(o[:, 0]), rep(o[:, 1]), rep(o[:, 2]),
         rep(d[:, 0]), rep(d[:, 1]), rep(d[:, 2]),
         rep(t_min), p_tmax),
        dimension=0, num_keys=1, is_stable=False,
    )

    r = pair_block(geom.march_leaf)
    g = -(-(n * k) // r)
    pad = g * r

    def pad1(a, fill=0.0):
        return (
            a if pad == n * k
            else jnp.concatenate([a, jnp.full((pad - n * k,), fill, a.dtype)])
        )

    zeros = jnp.zeros((pad,), jnp.float32)
    rays = jnp.stack(
        [
            pad1(o0), pad1(o1), pad1(o2),
            pad1(d0), pad1(d1), pad1(d2, fill=1.0),
            pad1(tmin_s), pad1(tmax_s, fill=0.0),
            pad1(pc_s.astype(jnp.float32), fill=float(lm)),
            zeros, zeros, zeros, zeros, zeros, zeros, zeros,
        ]
    ).reshape(16, g, r).swapaxes(0, 1)  # [G, 16, R]

    tris = _pair_tris_pack(geom)
    t_p, prim_p, v_p, w_p, flags_p = pair_sweep(
        rays, tris, any_hit=any_hit, interpret=interpret
    )
    # inverse permutation via one sort keyed on the recovered order
    _, t_p, prim_p, v_p, w_p, flags_p = lax.sort(
        (order,) + tuple(
            x.reshape(pad)[: n * k] for x in (t_p, prim_p, v_p, w_p, flags_p)
        ),
        dimension=0, num_keys=1, is_stable=False,
    )

    # --- K-way reduce per ray (each pair tested exactly one chunk) ----
    def byray(a):
        return a.reshape(n, k)

    t_p = byray(t_p)
    valid_p = byray(flags_p) >= 2.0
    tm = jnp.min(jnp.where(valid_p, t_p, jnp.inf), axis=1)  # [N]
    iota_k = lax.broadcasted_iota(jnp.int32, (n, k), 1)
    kw = jnp.min(
        jnp.where(valid_p & (t_p == tm[:, None]), iota_k, k), axis=1
    )
    one_hot = iota_k == kw[:, None]

    def pick(a):
        return jnp.sum(jnp.where(one_hot, byray(a), 0), axis=1)

    valid_r = jnp.isfinite(tm)
    t_r = jnp.where(valid_r, tm, t_max)
    prim_r = pick(prim_p)
    v_r = pick(v_p)
    w_r = pick(w_p)
    neg_r = pick(byray(flags_p) % 2.0) > 0.5

    # --- overflow fallback: block march with only-overflow lanes live -
    fb_tmax = jnp.where(overflow, t_max, 0.0)
    fb = _intersect_march_pallas(
        geom, o, d, t_min, fb_tmax, any_hit, interpret=interpret
    )
    take_fb = fb.valid
    return GeomHit(
        valid=valid_r | take_fb,
        t=jnp.where(take_fb, fb.t, t_r),
        prim=jnp.where(take_fb, fb.prim, prim_r),
        v=jnp.where(take_fb, fb.v, v_r),
        w=jnp.where(take_fb, fb.w, w_r),
        inside=jnp.where(take_fb, fb.inside, neg_r),
    )


_march_pallas_closest = _detached(
    lambda geom, o, d, t_min, t_max, sort_bias, coherence:
    _intersect_march_pallas(
        geom, o, d, t_min, t_max, any_hit=False, sort_bias=sort_bias,
        coherence=coherence,
    )
)
_march_pallas_any = _detached(
    lambda geom, o, d, t_min, t_max, coherence: _intersect_march_pallas(
        geom, o, d, t_min, t_max, any_hit=True, coherence=coherence
    )
)
_pairs_closest = _detached(
    lambda geom, o, d, t_min, t_max: _intersect_pairs(
        geom, o, d, t_min, t_max, any_hit=False
    )
)
_pairs_any = _detached(
    lambda geom, o, d, t_min, t_max: _intersect_pairs(
        geom, o, d, t_min, t_max, any_hit=True
    )
)


def intersect_closest(geom, o, d, t_min=None, t_max=None, sort_bias=None,
                      coherence=None):
    """Closest-hit traversal over the whole wavefront.

    geom: a Geometry pytree (scene.data.Geometry).
    o, d: [N, 3] rays.  Returns :class:`GeomHit`.
    sort_bias: optional [N] int32 coherence-class hint (march path only —
    see _intersect_march_pallas).
    coherence: optional [N] int32 origin chunk id, -1 unknown (march
    path only — see _ray_sort_keys).
    """
    from mcpt_tpu.ops.math import EPSILON_DISTANCE, MAX_FLOAT

    if t_min is None:
        t_min = EPSILON_DISTANCE
    if t_max is None:
        t_max = MAX_FLOAT
    if geom.p0.shape[0] <= DENSE_MAX_PRIMS:
        if _use_pallas_dense():
            return _intersect_dense_pallas(geom, o, d, t_min, t_max, False)
        return _intersect_dense(geom, o, d, t_min, t_max, any_hit=False)
    strategy = resolved_strategy(geom)
    if strategy == "packet":
        return _packet_closest(geom, o, d, t_min, t_max)
    if strategy == "pairs" and _use_pallas_march():
        return _pairs_closest(geom, o, d, t_min, t_max)
    if _use_pallas_march():
        return _march_pallas_closest(
            geom, o, d, t_min, t_max, sort_bias, coherence
        )
    return _march_closest(geom, o, d, t_min, t_max)


def intersect_any(geom, o, d, t_min=None, t_max=None, coherence=None):
    """Occlusion query; returns [N] bool."""
    from mcpt_tpu.ops.math import EPSILON_DISTANCE, MAX_FLOAT

    if t_min is None:
        t_min = EPSILON_DISTANCE
    if t_max is None:
        t_max = MAX_FLOAT
    if geom.p0.shape[0] <= DENSE_MAX_PRIMS:
        if _use_pallas_dense():
            return _intersect_dense_pallas(
                geom, o, d, t_min, t_max, True
            ).valid
        return _intersect_dense(geom, o, d, t_min, t_max, any_hit=True).valid
    strategy = resolved_strategy(geom)
    if strategy == "packet":
        return _packet_any(geom, o, d, t_min, t_max).valid
    if strategy == "pairs" and _use_pallas_march():
        return _pairs_any(geom, o, d, t_min, t_max).valid
    if _use_pallas_march():
        return _march_pallas_any(geom, o, d, t_min, t_max, coherence).valid
    return _march_any(geom, o, d, t_min, t_max).valid


def intersect_closest_brute(geom, o, d, t_min=None, t_max=None, chunk=512):
    """Reference oracle: test every primitive (for BVH equivalence tests)."""
    from mcpt_tpu.ops.math import EPSILON_DISTANCE, MAX_FLOAT

    if t_min is None:
        t_min = EPSILON_DISTANCE
    if t_max is None:
        t_max = MAX_FLOAT
    n = o.shape[0]
    p = geom.p0.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_best = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)).astype(jnp.float32)
    prim_best = jnp.zeros((n,), jnp.int32)
    v_best = jnp.zeros((n,), jnp.float32)
    w_best = jnp.zeros((n,), jnp.float32)
    in_best = jnp.zeros((n,), jnp.bool_)
    valid = jnp.zeros((n,), jnp.bool_)
    for start in range(0, p, chunk):
        end = min(start + chunk, p)
        hit, t, v, w, det_inv = intersect_triangle(
            o[:, None, :],
            d[:, None, :],
            geom.p0[None, start:end],
            geom.e1[None, start:end],
            geom.e2[None, start:end],
            t_min[:, None],
            t_best[:, None],
        )
        t = jnp.where(hit, t, jnp.inf)
        k = jnp.argmin(t, axis=1)
        tk = t[jnp.arange(n), k]
        take = jnp.isfinite(tk) & (tk < t_best)
        t_best = jnp.where(take, tk, t_best)
        prim_best = jnp.where(take, start + k, prim_best)
        v_best = jnp.where(take, v[jnp.arange(n), k], v_best)
        w_best = jnp.where(take, w[jnp.arange(n), k], w_best)
        in_best = jnp.where(take, det_inv[jnp.arange(n), k] < 0, in_best)
        valid = valid | take
    return GeomHit(valid=valid, t=t_best, prim=prim_best, v=v_best, w=w_best, inside=in_best)
