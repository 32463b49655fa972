"""Pallas TPU kernel: dense ray x triangle sweep entirely in VMEM.

The XLA dense path (`ops.traversal._intersect_dense`) round-trips [N, C]
intermediates through HBM between scan steps; this kernel keeps the whole
triangle table ([12, P] transposed, <=16k prims = 768KB) and all
intermediates in VMEM, so the sweep runs at the VPU roofline.  One grid
step processes a block of rays against every triangle chunk.

Layouts (TPU tiling: last dim 128 lanes):
  rays  [G, 8, R]   rows = (ox oy oz dx dy dz tmin tmax), R rays in lanes
  tris  [12, P]     rows = (p0 e1 e2 opaque pad pad), P prims in lanes
  outs  [G, R] each (t, prim, v, w, flags)

Used by ops.traversal.intersect_* when running on TPU; the jnp scan path
remains the oracle (tests compare both, kernel in interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 1024
TRI_CHUNK = 128


def _sweep_kernel(rays_ref, tris_ref, t_ref, prim_ref, v_ref, w_ref,
                  flags_ref, *, n_chunks, chunk, any_hit):
    rays = rays_ref[0]  # [8, R]
    r = rays.shape[1]

    def col(i):
        return rays[i, :].reshape(r, 1)  # [R, 1]

    ox, oy, oz = col(0), col(1), col(2)
    dx, dy, dz = col(3), col(4), col(5)
    t_min = col(6)
    t_best = col(7)  # init = t_max

    prim_best = jnp.full((r, 1), 0, jnp.int32)
    v_best = jnp.zeros((r, 1), jnp.float32)
    w_best = jnp.zeros((r, 1), jnp.float32)
    neg_best = jnp.zeros((r, 1), jnp.float32)  # det<0 flag
    valid = jnp.zeros((r, 1), jnp.float32)

    def body(ci, carry):
        t_best, prim_best, v_best, w_best, neg_best, valid = carry
        tri = tris_ref[:, pl.ds(ci * chunk, chunk)]  # [12, C]

        def row(i):
            return tri[i, :].reshape(1, chunk)  # [1, C]

        p0x, p0y, p0z = row(0), row(1), row(2)
        e1x, e1y, e1z = row(3), row(4), row(5)
        e2x, e2y, e2z = row(6), row(7), row(8)
        opq = row(9)

        # Moeller-Trumbore, outer-product broadcasting [R, C]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        det_safe = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
        inv = 1.0 / det_safe
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        v = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        w = (dx * qvx + dy * qvy + dz * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv

        hit = (
            (v >= 0.0) & (v <= 1.0) & (w >= 0.0) & (v + w <= 1.0)
            & (t >= t_min) & (t <= t_best) & (jnp.abs(det) > 1e-20)
        )
        if any_hit:
            hit = hit & (opq > 0.5)

        # argmin + attribute select without gathers (Mosaic-lowerable):
        # min-reduce t, recover the column by a masked iota min, then
        # one-hot select the attributes
        t_cand = jnp.where(hit, t, jnp.inf)
        tk = jnp.min(t_cand, axis=1, keepdims=True)          # [R, 1]
        take = jnp.isfinite(tk) & (tk < t_best)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        big = jnp.int32(2**30)
        k = jnp.min(
            jnp.where(t_cand == tk, iota_c, big), axis=1, keepdims=True
        )
        one_hot = iota_c == k
        vk = jnp.sum(jnp.where(one_hot, v, 0.0), axis=1, keepdims=True)
        wk = jnp.sum(jnp.where(one_hot, w, 0.0), axis=1, keepdims=True)
        detk = jnp.sum(jnp.where(one_hot, det, 0.0), axis=1, keepdims=True)
        return (
            jnp.where(take, tk, t_best),
            jnp.where(take, ci * chunk + k, prim_best),
            jnp.where(take, vk, v_best),
            jnp.where(take, wk, w_best),
            jnp.where(take, (detk < 0).astype(jnp.float32), neg_best),
            jnp.maximum(valid, take.astype(jnp.float32)),
        )

    carry = (t_best, prim_best, v_best, w_best, neg_best, valid)
    carry = jax.lax.fori_loop(0, n_chunks, body, carry)
    t_best, prim_best, v_best, w_best, neg_best, valid = carry

    t_ref[0] = t_best
    prim_ref[0] = prim_best
    v_ref[0] = v_best
    w_ref[0] = w_best
    flags_ref[0] = neg_best + 2.0 * valid


@functools.partial(
    jax.jit, static_argnames=("any_hit", "interpret")
)
def dense_sweep(rays, tris_t, any_hit: bool = False, interpret: bool = False):
    """rays: [G, 8, R] blocked ray components; tris_t: [12, P] transposed
    packed triangles (P a multiple of TRI_CHUNK or padded with zero
    edges).  Returns (t, prim, v, w, flags) each [G, R]; flags bit0 =
    backface, bit1 = valid."""
    g, _, r = rays.shape
    p = tris_t.shape[1]
    chunk = min(TRI_CHUNK, p)
    n_chunks = -(-p // chunk)

    kernel = functools.partial(
        _sweep_kernel, n_chunks=n_chunks, chunk=chunk, any_hit=any_hit
    )
    # outputs are [G, R, 1] so every block dim equals the array dim
    # (TPU lowering requires (8,128)-divisible or full-dim blocks)
    out_shape = [
        jax.ShapeDtypeStruct((g, r, 1), jnp.float32),   # t
        jax.ShapeDtypeStruct((g, r, 1), jnp.int32),     # prim
        jax.ShapeDtypeStruct((g, r, 1), jnp.float32),   # v
        jax.ShapeDtypeStruct((g, r, 1), jnp.float32),   # w
        jax.ShapeDtypeStruct((g, r, 1), jnp.float32),   # flags
    ]
    out_spec = pl.BlockSpec((1, r, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 8, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(rays, tris_t)
