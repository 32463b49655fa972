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

CHUNK_TILE = 256  # chunks slab-tested per phase-A tile


def ray_block(n_prims: int | None = None) -> int:
    """Rays per march block.  Smaller blocks shrink the per-block chunk
    corridor UNION (divergent regen wavefronts march the union, measured
    ~56 chunks at 512 vs ~7 for coherent rays) at the cost of more
    blocks; larger blocks amortize phase A.  Default 256 (r4 closing
    sweep, AFTER the variadic-sort wrapper + 256-tri chunks landed:
    conductor 2.46 -> 2.94, dielectric 2.05 -> 2.55, classroom 1.02,
    dining 1.48 Mrays/s; dragon statistically flat 28.4 vs 28.1 — the
    corridor-union shrink beats the per-block overhead everywhere once
    the fixed costs fell).  MCPT_MARCH_BLOCK overrides.  R is the LANE dimension of the
    [G, 8, R] ray layout, so it must be a positive multiple of 128 (a
    misaligned lane extent fails the Mosaic verifier — traversal.py's
    DMA-extent note); invalid values are rounded up with a warning
    instead of crashing."""
    import os

    del n_prims  # kept for call-site stability; default no longer varies
    raw = os.environ.get("MCPT_MARCH_BLOCK", "256")
    try:
        r = int(raw)
    except ValueError as e:
        raise ValueError(
            f"MCPT_MARCH_BLOCK must be an integer, got {raw!r}"
        ) from e
    if r <= 0:
        raise ValueError(f"MCPT_MARCH_BLOCK must be positive, got {r}")
    r_pad = -(-r // 128) * 128
    if r_pad != r:
        import warnings

        warnings.warn(
            f"MCPT_MARCH_BLOCK={r} is not a multiple of 128 (the VPU "
            f"lane width); rounding up to {r_pad}", stacklevel=2,
        )
    return r_pad


RAY_BLOCK = 512  # historical default; callers use ray_block()


def _chunk_group(ls: int, r: int = RAY_BLOCK) -> int:
    """Chunks marched per loop iteration (as one [R, cg*ls] sweep).
    Swept on matpreview-conductor end-to-end (lane target 64/256/512/
    1024/2048): 0.81 / 1.16 / 1.43 / 1.57 / scoped-VMEM-OOM Mrays/s —
    wide groups amortize the per-chunk loop+DMA bookkeeping and fill the
    VPU lanes; the nearest-first pruning loss is smaller than the
    overhead win on divergent wavefronts.  MCPT_MARCH_GROUP overrides
    the lane target; it self-clamps so the [R, cg*ls] sweep
    intermediates fit scoped VMEM (group 2048 at R=512 OOM'd the
    Mosaic scoped allocator — commit edd2d0a)."""
    import os

    # ~15 [R, cg*ls] f32 intermediates live through the sweep against a
    # 16 MB Mosaic scoped-VMEM stack; R=512 x 1024 lanes measured
    # 17.06 MB with the phase-A guards (r4) — budget R * (cg*ls) at
    # 384k lanes (=> 768 sweep lanes at the default R=512; 896
    # still measured 16.01 MB inside the fused regen loop).
    max_target = max(ls, (384 << 10) // max(r, 1))
    raw = os.environ.get("MCPT_MARCH_GROUP")
    if raw is None:
        target = min(1024, max_target)
    else:
        target = int(raw)
        if target > max_target:
            import warnings

            warnings.warn(
                f"MCPT_MARCH_GROUP={target} exceeds the scoped-VMEM budget "
                f"at MCPT_MARCH_BLOCK={r}; clamping to "
                f"{max_target}",
                stacklevel=2,
            )
            target = max_target
    return max(1, target // ls)
_INF = float("inf")  # python float: a jnp scalar would be a captured const


SUPER = 128  # chunks per super-chunk (one lane tile of the A1 cull)
SUP_LANES = 128  # lane width of the super arrays (n_sup <= 16 today)


def _march_kernel(rays_ref, cmin_ref, cmax_ref, smin_ref, smax_ref,
                  tris_ref, t_ref, prim_ref, v_ref, w_ref, flags_ref,
                  ent_ref, tri_vmem, dma_sem, *, lm, ls, any_hit,
                  interval, super_cull):
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

    # Dead blocks (every lane t_max <= t_min: exhausted regen slots and
    # NEE geo-fail tails, which the wrapper's sort packs together) skip
    # phase A — the dominant per-block fixed cost; the march loop then
    # runs zero iterations on its own (bound = max(t_max) = 0 <= te).
    # The guard is deliberately NARROW: wrapping the whole body in
    # pl.when doubles the Mosaic scoped-VMEM accounting and OOMs the
    # compile (r4 measurement).
    block_live = jnp.max(t_max - t_min) > 0.0

    @pl.when(jnp.logical_not(block_live))
    def _ent_dead():
        # take_group still reads ent to pick (unused) DMA indices — INF
        # keeps them deterministic instead of uninitialized VMEM
        ent_ref[0:1, :] = jnp.full((1, lm), _INF)

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

        @pl.when(block_live)
        def _write_interval_ent():
            ent_ref[0:1, :] = jnp.where(possible, ent_iv, _INF)

    def block_ent(bmin, bmax, width):
        """Block-min entry distance per chunk: slab-test every ray in the
        block against `width` AABBs ([4, width] min/max values) and
        reduce over rays.  The 1e30 cap drops padding chunks (parked at
        3e37, geometry.py) so all-miss lanes don't grind through them."""

        def near_far(lo_c, hi_c, o_c, rcp_c):
            lo = (lo_c.reshape(1, width) - o_c) * rcp_c
            hi = (hi_c.reshape(1, width) - o_c) * rcp_c
            return jnp.minimum(lo, hi), jnp.maximum(lo, hi)

        nx, fx = near_far(bmin[0], bmax[0], ox, rx)
        ny, fy = near_far(bmin[1], bmax[1], oy, ry)
        nz, fz = near_far(bmin[2], bmax[2], oz, rz)
        t_near = jnp.maximum(jnp.maximum(nx, ny), nz)
        t_enter = jnp.maximum(t_near, t_min)
        t_exit = jnp.minimum(jnp.minimum(jnp.minimum(fx, fy), fz), t_max)
        ent = jnp.where(
            (t_enter <= t_exit) & (t_enter < 1e30),
            jnp.maximum(t_enter, 0.0), _INF,
        )  # [R, width]
        return jnp.min(ent, axis=0, keepdims=True)

    if not interval and super_cull:
        # Two-level phase A: chunks are grouped (in their SAH-DFS order,
        # so consecutive chunks are spatially tight — geometry.py) into
        # supers of SUPER chunks whose union AABBs were computed by the
        # wrapper.  One [R, SUP_LANES] slab pass culls whole supers the
        # block never enters (EXACT for the block-min metric: no ray
        # enters the union => no ray enters any member chunk); only the
        # passing supers pay the dense per-chunk test.  The dense
        # [R, Lm] phase A was 80% of a coherent closest trace.
        sup_ent = block_ent(smin_ref[:, :], smax_ref[:, :], SUP_LANES)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, SUP_LANES), 1)
        n_sup = lm // SUPER

        def sup_tile(si, _):
            pred = block_live & (
                jnp.min(jnp.where(iota_s == si, sup_ent, _INF)) < 1e30
            )
            sl = pl.ds(si * SUPER, SUPER)

            @pl.when(pred)
            def _run():
                ent_ref[0:1, sl] = block_ent(
                    cmin_ref[:, sl], cmax_ref[:, sl], SUPER
                )

            @pl.when(jnp.logical_not(pred))
            def _skip():
                ent_ref[0:1, sl] = jnp.full((1, SUPER), _INF)

            return _

        jax.lax.fori_loop(0, n_sup, sup_tile, 0)
    else:
        n_tiles = 0 if interval else lm // CHUNK_TILE

        def slab_tile(ti, _):
            sl = pl.ds(ti * CHUNK_TILE, CHUNK_TILE)

            @pl.when(block_live)
            def _run():
                ent_ref[0:1, sl] = block_ent(
                    cmin_ref[:, sl], cmax_ref[:, sl], CHUNK_TILE
                )

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
    cg = _chunk_group(ls, r)
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


def _use_super_cull() -> bool:
    """Two-level phase A is the default (opt-out MCPT_MARCH_SUPER=0)."""
    import os

    return os.environ.get("MCPT_MARCH_SUPER", "1") == "1"


@functools.partial(
    jax.jit, static_argnames=("any_hit", "interpret", "interval",
                              "super_cull")
)
def march_sweep(rays, cmin, cmax, tris, any_hit: bool = False,
                interpret: bool = False, interval: bool = False,
                super_cull: bool = True):
    """rays: [G, 8, R]; cmin/cmax: [4, Lm] (Lm a multiple of CHUNK_TILE,
    padding chunks at 3e37); tris: [Lm, 16, ls].  Returns (t, prim, v,
    w, flags) each [G, R].  `interval=True` uses the conservative
    block-summary phase A (same hits, ~R x less cull work);
    `super_cull=True` (default) adds the exact two-level super-chunk
    cull to the dense phase A."""
    g, _, r = rays.shape
    lm = cmin.shape[1]
    ls = tris.shape[2]

    # union AABBs of SUPER consecutive chunks (SAH-DFS order => tight);
    # supers that contain padding chunks inherit a 3e37 corner, which
    # only makes their slab test pass — conservative, never wrong
    n_sup = lm // SUPER
    super_cull = super_cull and 0 < n_sup <= SUP_LANES and lm % SUPER == 0
    if super_cull:
        smin = jnp.concatenate(
            [cmin[:, : n_sup * SUPER].reshape(4, n_sup, SUPER).min(axis=2),
             jnp.full((4, SUP_LANES - n_sup), 3.0e37, cmin.dtype)], axis=1
        )
        smax = jnp.concatenate(
            [cmax[:, : n_sup * SUPER].reshape(4, n_sup, SUPER).max(axis=2),
             jnp.full((4, SUP_LANES - n_sup), 3.0e37, cmax.dtype)], axis=1
        )
    else:
        # the kernel never reads smin/smax on this path; ship cheap
        # zeros instead of computing (or crashing on) the real unions —
        # scenes with > SUP_LANES*SUPER chunks made the old
        # unconditional jnp.full raise at trace time (ADVICE r3, high)
        smin = jnp.zeros((4, SUP_LANES), cmin.dtype)
        smax = jnp.zeros((4, SUP_LANES), cmax.dtype)

    kernel = functools.partial(
        _march_kernel, lm=lm, ls=ls, any_hit=any_hit, interval=interval,
        super_cull=super_cull,
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
            pl.BlockSpec((4, SUP_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, SUP_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),          # tris stay in HBM
        ],
        out_specs=[out_spec] * 5,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, lm), jnp.float32),   # ent
            # double-buffered chunk GROUPS + one DMA semaphore per copy
            pltpu.VMEM((2, _chunk_group(ls, r), tris.shape[1], ls),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2, _chunk_group(ls, r))),
        ],
        interpret=interpret,
    )(rays, cmin, cmax, smin, smax, tris)
