"""Pallas TPU kernel: pair-scheduled (ray, chunk) traversal.

The block march (ops.pallas_march) assigns RAYS to blocks; every block
sweeps the UNION of its member rays' chunk corridors, so divergent
bounce/shadow wavefronts pay for chunks most member rays never enter
(measured on matpreview-conductor: mean per-ray corridor 2.86 chunks vs
mean per-block union 16.8 at R=256 — scripts/corridor_probe.py — i.e.
~6x redundant sweep work, and no ray sort key fixes it because the
union is direction-divergence-bound).

This kernel assigns (ray, chunk) PAIRS to blocks instead — the TPU
equivalent of stream compaction.  The wrapper (ops.traversal.
_intersect_pairs) slab-tests rays against all chunk AABBs, expands each
ray into its <= K corridor pairs, and sorts pairs by chunk id (one
variadic `lax.sort`; 512k-lane sorts cost the same ~1.4 ms as 64k —
dispatch-bound, scripts/pair_sort_probe.py).  A block of R consecutive
pairs therefore spans only a handful of DISTINCT chunks (pairs-per-
chunk ~ N*K/Lm >> R), and each loop iteration DMAs ONE chunk and runs
one dense [R, ls] Moeller-Trumbore sweep in which every lane is a pair
that genuinely wants that chunk.  Total sweep work = sum of corridor
lengths, the information-theoretic floor — there is no union waste and
no nearest-first selection chain.

Nearest-first ordering is deliberately dropped: corridors are so short
(p99 <= 12 on the shipped scenes) that testing a ray's FULL corridor
costs less than the ordering machinery saved (the probe's unpruned vs
pruned corridor means differ by < 8%).  Each pair lane takes hits only
for its own chunk; the per-ray nearest hit is a K-way min in the
wrapper after the inverse sort.

Layouts (TPU tiling: last dim is 128 lanes):
  rays  [G, 16, R]  rows = (ox oy oz dx dy dz tmin tmax chunk pad*7);
                    `chunk` is the pair's chunk id as f32 (ids < 2^24
                    exact); dead pairs carry chunk = Lm and tmax = 0
  tris  [Lm, 16, ls] packed chunk triangles (HBM; rows p0/e1/e2 xyz,
                    opaque, prim-id, pad — same pack as pallas_march;
                    the 16-row / 128-lane extents keep every per-chunk
                    DMA a whole (8, 128) f32 tile, march_fault_probe)
  outs  [G, 1, R] each (t, prim, v, w, flags); flags bit0 backface,
                    bit1 valid — value semantics identical to
                    pallas_march.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")


def pair_k() -> int:
    """Corridor pair slots per ray.  8 covers p99 of every shipped
    scene's corridor distribution (corridor_probe: conductor shadow p99
    7, continuation-unpruned p99 12 — overflow rays fall back to the
    block march).  MCPT_PAIR_K overrides."""
    import os

    return max(1, int(os.environ.get("MCPT_PAIR_K", "8")))


def pair_block(ls: int = 256) -> int:
    """Pairs per kernel block (the sweep's LANE extent).  The scoped-
    VMEM budget bounds R*ls at ~128k lanes (~15 live [ls, R] f32 sweep
    intermediates under the 16 MB Mosaic limit), so the default scales
    inversely with the scene's chunk size: 512 pairs at ls=256, 1024 at
    ls=128 — fewer blocks, same-shaped sweeps.  MCPT_PAIR_BLOCK
    overrides; rounded up to a multiple of 128 (the lane width)."""
    import os

    raw = os.environ.get("MCPT_PAIR_BLOCK")
    # measured (classroom, ls=128): scaling R up to 1024 to fill the
    # VMEM budget is ~8% SLOWER than flat 512 — wider blocks span more
    # distinct chunks, so iteration count stays put while the per-
    # iteration latency grows.  Flat 512 is the sweet spot.
    r = int(raw) if raw is not None else 512
    return max(128, -(-r // 128) * 128)


def _pair_kernel(rays_ref, tris_ref, t_ref, prim_ref, v_ref, w_ref,
                 flags_ref, tri_vmem, dma_sem, *, lm, ls, any_hit):
    # TRANSPOSED orientation: pairs stay in the LANE dimension end to
    # end ([1, R] rows straight off the input block; sweeps are
    # [ls, R] with triangles in sublanes).  The first cut kept rays in
    # sublanes like pallas_march, which needs nine [1,R] -> [R,1]
    # relayouts before the loop — measured 6.4 ms for an ALL-DEAD 512k
    # stream (~6.3 us/block of pure fixed cost, scripts/
    # pair_kernel_probe.py).  Row orientation moves the relayout cost
    # to the eleven [1, ls] -> [ls, 1] triangle rows, paid only per
    # LIVE loop iteration, and makes dead tail blocks (the K-slot
    # padding) near-free.
    rays = rays_ref[0]  # [16, R]
    r = rays.shape[1]

    def row_of(i):
        return rays[i : i + 1, :]  # [1, R]

    ox, oy, oz = row_of(0), row_of(1), row_of(2)
    dx, dy, dz = row_of(3), row_of(4), row_of(5)
    t_min = row_of(6)
    t_max = row_of(7)
    own = row_of(8)  # pair chunk id (f32; lm = dead sentinel)

    sent = jnp.float32(lm)

    def take_next(rem, slot):
        """Pop the smallest undone chunk id, start its DMA into buffer
        `slot`, mask every pair of that chunk off.  When none remain the
        pop is the sentinel (degenerate index 0 copy, never read)."""
        cur = jnp.min(rem)
        ci = jnp.where(cur < sent, cur, 0.0).astype(jnp.int32)
        pltpu.make_async_copy(
            tris_ref.at[ci], tri_vmem.at[slot], dma_sem.at[slot]
        ).start()
        rem = jnp.where(rem == cur, sent, rem)
        return rem, cur

    rem0, cur0 = take_next(own, 0)

    best0 = (
        t_max,                               # t_best
        jnp.zeros((1, r), jnp.float32),      # prim (f32: ids < 2^24)
        jnp.zeros((1, r), jnp.float32),      # v
        jnp.zeros((1, r), jnp.float32),      # w
        jnp.zeros((1, r), jnp.float32),      # det<0 flag
        jnp.zeros((1, r), jnp.float32),      # valid
    )

    def cond(state):
        _, _, it, cur = state
        return cur < sent

    def body(state):
        rem, best, it, cur = state
        t_best, prim_best, v_best, w_best, neg_best, valid = best
        slot = jax.lax.rem(it, 2)

        rem, cur_next = take_next(rem, 1 - slot)

        pltpu.make_async_copy(
            tris_ref.at[jnp.int32(0)], tri_vmem.at[slot], dma_sem.at[slot]
        ).wait()
        tri = tri_vmem[slot]  # [16, ls]

        def col(i):  # triangle attribute as a [ls, 1] column
            return tri[i, :].reshape(ls, 1)

        p0x, p0y, p0z = col(0), col(1), col(2)
        e1x, e1y, e1z = col(3), col(4), col(5)
        e2x, e2y, e2z = col(6), col(7), col(8)
        opq = col(9)
        pid = col(10)

        # [ls, R] sweep: tri columns broadcast against pair rows
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
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
            & (own == cur)  # only pairs OF this chunk take its hits
        )
        if any_hit:
            hit = hit & (opq > 0.5)

        t_cand = jnp.where(hit, t, _INF)
        tk = jnp.min(t_cand, axis=0, keepdims=True)  # [1, R]
        take = jnp.isfinite(tk) & (tk < t_best)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (ls, r), 0)
        k = jnp.min(
            jnp.where(t_cand == tk, iota_c, jnp.int32(2**30)),
            axis=0, keepdims=True,
        )
        one_hot = iota_c == k
        vk = jnp.sum(jnp.where(one_hot, v, 0.0), axis=0, keepdims=True)
        wk = jnp.sum(jnp.where(one_hot, w, 0.0), axis=0, keepdims=True)
        detk = jnp.sum(jnp.where(one_hot, det, 0.0), axis=0, keepdims=True)
        pidk = jnp.sum(jnp.where(one_hot, pid, 0.0), axis=0, keepdims=True)

        best = (
            jnp.where(take, tk, t_best),
            jnp.where(take, pidk, prim_best),
            jnp.where(take, vk, v_best),
            jnp.where(take, wk, w_best),
            jnp.where(take, (detk < 0).astype(jnp.float32), neg_best),
            jnp.maximum(valid, take.astype(jnp.float32)),
        )
        return rem, best, it + 1, cur_next

    _, best, it, _ = jax.lax.while_loop(
        cond, body, (rem0, best0, jnp.int32(0), cur0)
    )
    # exactly one copy outstanding: the pre-loop start if the loop never
    # ran, else the last body's prefetch
    last = jax.lax.rem(it, 2)
    pltpu.make_async_copy(
        tris_ref.at[jnp.int32(0)], tri_vmem.at[last], dma_sem.at[last]
    ).wait()
    t_best, prim_best, v_best, w_best, neg_best, valid = best

    t_ref[0] = t_best
    prim_ref[0] = prim_best.astype(jnp.int32)
    v_ref[0] = v_best
    w_ref[0] = w_best
    flags_ref[0] = neg_best + 2.0 * valid


CORRIDOR_TILE = 256  # chunk sublanes per slab tile in the corridor kernel


def _corridor_kernel(rays_ref, cmin_ref, cmax_ref, out_ref, mask_ref, *,
                     lm, k):
    """Per-ray corridor extraction, VMEM-resident.

    Replaces the wrapper's XLA [N, Lm] slab + K-pass extraction, which
    materializes ~10 [N, Lm] f32 arrays through HBM — measured 6.5 ms at
    Lm=373 and ~25 ms at classroom's Lm=1335 (scripts/traversal_ab.py),
    scaling with Lm.  Here the [Lm, R] mask lives in VMEM scratch:
    slab-test in [CORRIDOR_TILE, R] tiles (chunks in sublanes, rays in
    lanes — both inputs arrive in their natural layout, zero
    relayouts), then K masked-min passes pop each ray's corridor chunk
    ids in index order.

    out rows: 0..k-1 = chunk ids (f32; lm = none), row k = overflow
    flag (corridor longer than k slots -> the ray falls back to the
    block march)."""
    rays = rays_ref[0]  # [8, R]
    r = rays.shape[1]

    def row_of(i):
        return rays[i : i + 1, :]  # [1, R]

    ox, oy, oz = row_of(0), row_of(1), row_of(2)
    dx, dy, dz = row_of(3), row_of(4), row_of(5)
    t_min = row_of(6)
    t_max = row_of(7)

    def rcp(x):
        return 1.0 / jnp.where(
            jnp.abs(x) < 1e-12, jnp.where(x < 0, -1e-12, 1e-12), x
        )

    rx, ry, rz = rcp(dx), rcp(dy), rcp(dz)
    o3 = (ox, oy, oz)
    r3 = (rx, ry, rz)

    lm_pad = mask_ref.shape[0]
    n_tiles = lm_pad // CORRIDOR_TILE

    def slab_tile(ti, _):
        sl = pl.ds(ti * CORRIDOR_TILE, CORRIDOR_TILE)
        t_near = jnp.full((CORRIDOR_TILE, r), -_INF)
        t_far = jnp.full((CORRIDOR_TILE, r), _INF)
        for a in range(3):
            blo = cmin_ref[sl, a : a + 1]  # [CT, 1]
            bhi = cmax_ref[sl, a : a + 1]
            lo = (blo - o3[a]) * r3[a]     # [CT, R]
            hi = (bhi - o3[a]) * r3[a]
            t_near = jnp.maximum(t_near, jnp.minimum(lo, hi))
            t_far = jnp.minimum(t_far, jnp.maximum(lo, hi))
        t_enter = jnp.maximum(t_near, t_min)
        t_exit = jnp.minimum(t_far, t_max)
        ok = (t_enter <= t_exit) & (t_enter < 1e30)
        mask_ref[sl, :] = ok.astype(jnp.float32)
        return _

    jax.lax.fori_loop(0, n_tiles, slab_tile, 0)

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (lm_pad, r), 0)
    m = mask_ref[...]  # [Lm_pad, R]; padding chunks never pass the slab
    for j in range(k):
        ci = jnp.min(
            jnp.where(m > 0.0, iota_s, jnp.int32(lm)), axis=0,
            keepdims=True,
        )  # [1, R] int32
        out_ref[0, j : j + 1, :] = ci.astype(jnp.float32)
        m = jnp.where(iota_s == ci, 0.0, m)
    # overflow: corridor not exhausted after k pops
    out_ref[0, k : k + 1, :] = jnp.max(m, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def corridor_sweep(rays, cmin, cmax, k: int = 8, interpret: bool = False):
    """rays: [G, 8, R] (rows o/d/tmin/tmax); cmin/cmax: [Lm_pad, 3]
    chunk AABBs (sublane-padded with 3e37 far points).  Returns
    [G, 16, R] f32: rows 0..k-1 per-ray corridor chunk ids in index
    order (lm_real = none), row k = overflow flag."""
    g, _, r = rays.shape
    lm_pad = cmin.shape[0]
    if k > 14:
        raise ValueError(f"corridor k={k} exceeds the 15 output rows")

    kernel = functools.partial(_corridor_kernel, lm=lm_pad, k=k)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 8, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lm_pad, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lm_pad, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, r), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 16, r), jnp.float32),
        scratch_shapes=[pltpu.VMEM((lm_pad, r), jnp.float32)],
        interpret=interpret,
    )(rays, cmin, cmax)


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def pair_sweep(rays, tris, any_hit: bool = False, interpret: bool = False):
    """rays: [G, 16, R] (see module docstring); tris: [Lm, 16, ls].
    Returns (t, prim, v, w, flags) each [G, R]."""
    g, _, r = rays.shape
    lm = tris.shape[0]
    ls = tris.shape[2]

    kernel = functools.partial(_pair_kernel, lm=lm, ls=ls, any_hit=any_hit)
    out_shape = [
        jax.ShapeDtypeStruct((g, 1, r), jnp.float32),   # t
        jax.ShapeDtypeStruct((g, 1, r), jnp.int32),     # prim
        jax.ShapeDtypeStruct((g, 1, r), jnp.float32),   # v
        jax.ShapeDtypeStruct((g, 1, r), jnp.float32),   # w
        jax.ShapeDtypeStruct((g, 1, r), jnp.float32),   # flags
    ]
    out_spec = pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 16, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),          # tris stay in HBM
        ],
        out_specs=[out_spec] * 5,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, tris.shape[1], ls), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rays, tris)
