"""Pallas TPU kernel: nearest-chunk-first leaf march for large scenes.

TPU-native replacement for the reference's per-thread stackful TLAS walk
(csrt src/rtcore/accel/tlas.cpp:13-76) at the block level, and for the
XLA march (`ops.traversal._intersect_march`) at the memory level.  The
XLA march pays two HBM taxes every iteration: the [N, Lm] entry-distance
matrix is re-read/re-written, and `march_tris[li]` is a per-lane gather
of [N, ls, 12] rows.  This kernel keeps everything block-local in VMEM:

  * grid over ray blocks (R rays each, Morton/octant-sorted outside so a
    block's rays share chunks);
  * phase A: slab-test the block against all Lm chunk AABBs in [R, CT]
    tiles, reducing to a per-chunk block-min entry distance `ent[Lm]`;
  * phase B: `lax.while_loop` — pick the nearest unprocessed chunk
    (scalar masked-iota argmin over `ent`), DMA that chunk's [16, ls]
    triangle rows HBM→VMEM by SCALAR index (one dense copy, no per-lane
    gather), dense [R, ls] Möller–Trumbore, mask the chunk off.  The
    loop ends when the nearest remaining chunk entry is beyond every
    live lane's current best t — iterations scale with the block's depth
    complexity, not with Lm.

Layouts (TPU tiling: last dim is 128 lanes):
  rays  [G, 8, R]    rows = (ox oy oz dx dy dz tmin tmax)
  cmin  [4, Lm]      chunk AABB min, xyz rows + pad row, Lm chunks in lanes
  cmax  [4, Lm]
  tris  [Lm, 16, ls] packed chunk triangles (HBM-resident; row layout =
                     p0 xyz / e1 xyz / e2 xyz / opaque / prim-id / pad x5;
                     16 rows because the per-chunk DMA extent must be
                     whole (8,128) f32 tiles — a 12-row copy faults the
                     chip, scripts/march_fault_probe.py)
  outs  [G, R] each (t, prim, v, w, flags);  flags bit0 = backface,
                     bit1 = valid — identical to ops.pallas_dense.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 512
CHUNK_TILE = 256  # chunks slab-tested per phase-A tile


def _chunk_group(ls: int) -> int:
    """Chunks marched per loop iteration (as one [R, cg*ls] sweep).
    Swept on matpreview-conductor end-to-end (lane target 64/256/512/
    1024/2048): 0.81 / 1.16 / 1.43 / 1.57 / scoped-VMEM-OOM Mrays/s —
    wide groups amortize the per-chunk loop+DMA bookkeeping and fill the
    VPU lanes; the nearest-first pruning loss is smaller than the
    overhead win on divergent wavefronts.  MCPT_MARCH_GROUP overrides
    the lane target."""
    import os

    target = int(os.environ.get("MCPT_MARCH_GROUP", 1024))
    return max(1, target // ls)
_INF = float("inf")  # python float: a jnp scalar would be a captured const


def _march_kernel(rays_ref, cmin_ref, cmax_ref, tris_ref,
                  t_ref, prim_ref, v_ref, w_ref, flags_ref,
                  ent_ref, tri_vmem, dma_sem, *, lm, ls, any_hit,
                  interval):
    rays = rays_ref[0]  # [8, R]
    r = rays.shape[1]

    def col(i):
        return rays[i, :].reshape(r, 1)  # [R, 1]

    ox, oy, oz = col(0), col(1), col(2)
    dx, dy, dz = col(3), col(4), col(5)
    t_min = col(6)
    t_max = col(7)

    def rcp(x):
        return 1.0 / jnp.where(
            jnp.abs(x) < 1e-12, jnp.where(x < 0, -1e-12, 1e-12), x
        )

    rx, ry, rz = rcp(dx), rcp(dy), rcp(dz)

    # ---- phase A: block-min entry distance per chunk ------------------
    if interval:
        # Conservative interval phase A: the per-ray [R, Lm] slab test is
        # 80% of a closest-trace call (measured 3.8 of 4.8 ms at 64k rays
        # x 1452 chunks).  The per-chunk block-min entry is only used for
        # marching ORDER and the termination bound, so a lower bound over
        # the whole block suffices: summarize the block's rays as
        # per-axis origin/direction intervals (blocks are octant+Morton
        # sorted, so the intervals are tight) and slab-test the summary
        # against every chunk in [1, Lm] work — ~R times less VPU work.
        # Mixed-sign axes (the padded tail block) fall back to "no bound"
        # on that axis, which only loosens the order, never drops a hit.
        ol = (jnp.min(ox), jnp.min(oy), jnp.min(oz))
        oh = (jnp.max(ox), jnp.max(oy), jnp.max(oz))
        dl = (jnp.min(dx), jnp.min(dy), jnp.min(dz))
        dh = (jnp.max(dx), jnp.max(dy), jnp.max(dz))
        tmin_lo = jnp.min(t_min)
        tmax_hi = jnp.max(t_max)

        near_l = jnp.full((1, lm), -_INF)
        far_u = jnp.full((1, lm), _INF)
        for a in range(3):
            blo = cmin_ref[a, :].reshape(1, lm)
            bhi = cmax_ref[a, :].reshape(1, lm)
            single = (dl[a] > 0.0) | (dh[a] < 0.0)
            # single-sign inverse interval: [1/dh, 1/dl] in both cases
            safe_dh = jnp.where(jnp.abs(dh[a]) < 1e-30, 1e-30, dh[a])
            safe_dl = jnp.where(jnp.abs(dl[a]) < 1e-30, 1e-30, dl[a])
            il = 1.0 / safe_dh
            ih = 1.0 / safe_dl
            al, ah = blo - oh[a], blo - ol[a]
            bl, bh = bhi - oh[a], bhi - ol[a]

            def pmin(xl, xh):
                return jnp.minimum(
                    jnp.minimum(xl * il, xl * ih),
                    jnp.minimum(xh * il, xh * ih),
                )

            def pmax(xl, xh):
                return jnp.maximum(
                    jnp.maximum(xl * il, xl * ih),
                    jnp.maximum(xh * il, xh * ih),
                )

            nl = jnp.minimum(pmin(al, ah), pmin(bl, bh))
            fu = jnp.maximum(pmax(al, ah), pmax(bl, bh))
            near_l = jnp.maximum(near_l, jnp.where(single, nl, -_INF))
            far_u = jnp.minimum(far_u, jnp.where(single, fu, _INF))

        ent_iv = jnp.maximum(jnp.maximum(near_l, tmin_lo), 0.0)
        possible = (
            (ent_iv <= jnp.minimum(far_u, tmax_hi)) & (near_l < 1e30)
        )
        ent_ref[0:1, :] = jnp.where(possible, ent_iv, _INF)

    n_tiles = 0 if interval else lm // CHUNK_TILE

    def slab_tile(ti, _):
        sl = pl.ds(ti * CHUNK_TILE, CHUNK_TILE)
        bmin = cmin_ref[:, sl]  # [4, CT]
        bmax = cmax_ref[:, sl]

        def near_far(lo_c, hi_c, o_c, rcp_c):
            lo = (lo_c.reshape(1, CHUNK_TILE) - o_c) * rcp_c
            hi = (hi_c.reshape(1, CHUNK_TILE) - o_c) * rcp_c
            return jnp.minimum(lo, hi), jnp.maximum(lo, hi)

        nx, fx = near_far(bmin[0], bmax[0], ox, rx)
        ny, fy = near_far(bmin[1], bmax[1], oy, ry)
        nz, fz = near_far(bmin[2], bmax[2], oz, rz)
        t_near = jnp.maximum(jnp.maximum(nx, ny), nz)
        t_enter = jnp.maximum(t_near, t_min)
        t_exit = jnp.minimum(jnp.minimum(jnp.minimum(fx, fy), fz), t_max)
        # the 1e30 cap drops padding chunks (parked at 3e37, geometry.py)
        # so all-miss lanes don't grind through them
        ent = jnp.where(
            (t_enter <= t_exit) & (t_enter < 1e30),
            jnp.maximum(t_enter, 0.0), _INF,
        )  # [R, CT]
        ent_ref[0:1, sl] = jnp.min(ent, axis=0, keepdims=True)
        return _

    jax.lax.fori_loop(0, n_tiles, slab_tile, 0)

    # ---- phase B: nearest-chunk-first march ---------------------------
    # Chunks are processed in GROUPS of `cg` nearest (cg*ls lanes per
    # Möller-Trumbore sweep): at ls=64 a single-chunk sweep fills half a
    # VPU lane tile and ~75% of the 5.3 us per-chunk time is loop/DMA
    # bookkeeping; grouping amortizes both.  Groups are double-buffered:
    # the cg copies for group k+1 are issued before group k's triangle
    # tests, so exactly one group of copies is outstanding at every loop
    # boundary and the post-loop wait drains it unconditionally.
    cg = _chunk_group(ls)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, lm), 1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (r, cg * ls), 1)

    ent0 = ent_ref[0:1, :]  # [1, Lm] value
    best0 = (
        t_max,                               # t_best
        jnp.zeros((r, 1), jnp.int32),        # prim
        jnp.zeros((r, 1), jnp.float32),      # v
        jnp.zeros((r, 1), jnp.float32),      # w
        jnp.zeros((r, 1), jnp.float32),      # det<0 flag
        jnp.zeros((r, 1), jnp.float32),      # valid
    )

    def bound_of(best):
        t_best, _, _, _, _, valid = best
        # any-hit lanes stop needing chunks once occluded
        cap = jnp.where(valid > 0.0, 0.0, t_best) if any_hit else t_best
        return jnp.max(cap)

    def take_group(ent, slot):
        """Pop the cg nearest unprocessed chunks, start their copies
        into buffer `slot`, return (masked ent, entry of the nearest).
        When fewer than cg remain the surplus picks degenerate index 0 —
        re-testing a chunk is idempotent (min/one-hot winner update)."""
        te0 = None
        for j in range(cg):
            m = jnp.min(ent)
            ci = jnp.min(jnp.where(ent == m, iota_l, jnp.int32(lm - 1)))
            if j == 0:
                te0 = m
            ent = jnp.where(iota_l == ci, _INF, ent)
            pltpu.make_async_copy(
                tris_ref.at[ci], tri_vmem.at[slot, j], dma_sem.at[slot, j]
            ).start()
        return ent, te0

    ent0, te0 = take_group(ent0, 0)

    def cond(state):
        ent, best, it, te = state
        # te is the entry distance of the nearest chunk in the in-flight
        # group — exactly the min(ent) the ungrouped loop would test, so
        # best-t pruning keeps the same bound (at group granularity).
        return te < bound_of(best)

    def body(state):
        ent, best, it, te = state
        t_best, prim_best, v_best, w_best, neg_best, valid = best
        slot = jax.lax.rem(it, 2)

        # prefetch the next group into the other buffer (selection only
        # depends on masking order, not t_best: marching order unchanged)
        ent, te_next = take_group(ent, 1 - slot)

        for j in range(cg):
            pltpu.make_async_copy(
                tris_ref.at[jnp.int32(0)], tri_vmem.at[slot, j],
                dma_sem.at[slot, j],
            ).wait()
        tri = tri_vmem[slot]  # [cg, 16, ls]

        def row(i):
            if cg == 1:
                return tri[0, i, :].reshape(1, ls)
            return jnp.concatenate(
                [tri[j, i, :].reshape(1, ls) for j in range(cg)], axis=1
            )

        p0x, p0y, p0z = row(0), row(1), row(2)
        e1x, e1y, e1z = row(3), row(4), row(5)
        e2x, e2y, e2z = row(6), row(7), row(8)
        opq = row(9)
        pid = row(10)  # global prim id as f32 (geometry.py SAH chunks)

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
        )
        if any_hit:
            hit = hit & (opq > 0.5)

        t_cand = jnp.where(hit, t, _INF)
        tk = jnp.min(t_cand, axis=1, keepdims=True)  # [R, 1]
        take = jnp.isfinite(tk) & (tk < t_best)
        k = jnp.min(
            jnp.where(t_cand == tk, iota_c, jnp.int32(2**30)),
            axis=1, keepdims=True,
        )
        one_hot = iota_c == k
        vk = jnp.sum(jnp.where(one_hot, v, 0.0), axis=1, keepdims=True)
        wk = jnp.sum(jnp.where(one_hot, w, 0.0), axis=1, keepdims=True)
        detk = jnp.sum(jnp.where(one_hot, det, 0.0), axis=1, keepdims=True)
        pidk = jnp.sum(jnp.where(one_hot, pid, 0.0), axis=1, keepdims=True)

        best = (
            jnp.where(take, tk, t_best),
            jnp.where(take, pidk.astype(jnp.int32), prim_best),
            jnp.where(take, vk, v_best),
            jnp.where(take, wk, w_best),
            jnp.where(take, (detk < 0).astype(jnp.float32), neg_best),
            jnp.maximum(valid, take.astype(jnp.float32)),
        )
        return ent, best, it + 1, te_next

    _, best, it, _ = jax.lax.while_loop(
        cond, body, (ent0, best0, jnp.int32(0), te0)
    )
    # exactly one GROUP of copies is outstanding here (the pre-loop start
    # when the loop ran zero times, else the last body's prefetch)
    last = jax.lax.rem(it, 2)
    for j in range(cg):
        pltpu.make_async_copy(
            tris_ref.at[jnp.int32(0)], tri_vmem.at[last, j],
            dma_sem.at[last, j],
        ).wait()
    t_best, prim_best, v_best, w_best, neg_best, valid = best

    t_ref[0] = t_best
    prim_ref[0] = prim_best
    v_ref[0] = v_best
    w_ref[0] = w_best
    flags_ref[0] = neg_best + 2.0 * valid


@functools.partial(
    jax.jit, static_argnames=("any_hit", "interpret", "interval")
)
def march_sweep(rays, cmin, cmax, tris, any_hit: bool = False,
                interpret: bool = False, interval: bool = False):
    """rays: [G, 8, R]; cmin/cmax: [4, Lm] (Lm a multiple of CHUNK_TILE,
    padding chunks at 3e37); tris: [Lm, 16, ls].  Returns (t, prim, v,
    w, flags) each [G, R].  `interval=True` uses the conservative
    block-summary phase A (same hits, ~R x less cull work)."""
    g, _, r = rays.shape
    lm = cmin.shape[1]
    ls = tris.shape[2]

    kernel = functools.partial(
        _march_kernel, lm=lm, ls=ls, any_hit=any_hit, interval=interval
    )
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
            pl.BlockSpec((4, lm), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, lm), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),          # tris stay in HBM
        ],
        out_specs=[out_spec] * 5,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, lm), jnp.float32),   # ent
            # double-buffered chunk GROUPS + one DMA semaphore per copy
            pltpu.VMEM((2, _chunk_group(ls), tris.shape[1], ls),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2, _chunk_group(ls))),
        ],
        interpret=interpret,
    )(rays, cmin, cmax, tris)
