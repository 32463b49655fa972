"""Corridor-union probe: which ray sort key minimizes march phase-B work?

Phase-B cost per block = |union of member rays' chunk corridors| x one
[R, cg*ls] sweep.  This probe builds the REAL bounce-mix wavefront of a
scene (camera rays -> BSDF-sampled continuations + envmap/area shadow
segments), computes each ray's corridor on the host (chunks whose slab
entry lies inside [0, t_cap] — t_cap = the actual nearest hit for
continuation rays, segment length for shadow rays), then reports the
mean per-block union size for several candidate sort keys.  March time
scales with exactly sum-over-blocks(|union|), so this predicts kernel
time without burning chip hours per variant.

    python scripts/corridor_probe.py [xml] [n_lanes_log2]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def morton10(x):
    x = (x.astype(np.uint64)) & 0x3FF
    x = (x | (x << 16)) & 0xFF0000FF
    x = (x | (x << 8)) & 0x0F00F00F
    x = (x | (x << 4)) & 0xC30C30C3
    x = (x | (x << 2)) & 0x49249249
    return x


def keys_for(mode, o, d, coh, lo, hi):
    span = np.maximum(hi - lo, 1e-12)
    q = np.clip((o - lo) / span, 0.0, 1.0)
    qi = (q * 1023.0).astype(np.uint64)
    m = (morton10(qi[:, 0]) << 2) | (morton10(qi[:, 1]) << 1) | morton10(
        qi[:, 2]
    )
    octant = (
        (d[:, 0] >= 0).astype(np.uint64) * 4
        + (d[:, 1] >= 0).astype(np.uint64) * 2
        + (d[:, 2] >= 0).astype(np.uint64)
    )
    c = np.clip(coh, 0, 2047).astype(np.uint64)
    has = coh >= 0
    if mode == "octori":
        return (octant << 26) | (m >> 4)
    if mode == "chunk-oct-mor":  # r5 first cut
        k = (c << 18) | (octant << 15) | (m >> 15)
        return np.where(has, k, (octant << 26) | (m >> 4))
    if mode == "oct-chunk-mor":
        k = (octant << 26) | (c << 15) | (m >> 15)
        return np.where(has, k, (octant << 26) | (m >> 4))
    if mode == "chunk-mor":
        k = (c << 18) | (m >> 12)
        return np.where(has, k, (octant << 26) | (m >> 4))
    if mode == "mor-oct":
        return (m << 3) >> 4 | octant  # fine morton major, octant minor
    raise ValueError(mode)


def block_union_stats(keys, corridors, r=256):
    order = np.argsort(keys, kind="stable")
    tot = 0
    blocks = 0
    uni_sizes = []
    for s in range(0, len(order), r):
        ix = order[s : s + r]
        u = set()
        live = False
        for i in ix:
            cs = corridors[i]
            if cs is not None:
                u |= cs
                live = True
        if live:
            uni_sizes.append(len(u))
            tot += len(u)
            blocks += 1
    return tot, blocks, np.mean(uni_sizes) if uni_sizes else 0.0, np.max(
        uni_sizes
    ) if uni_sizes else 0


def main():
    xml = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/resources/scene/matpreview/conductor.xml"
    )
    nlog = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << nlog

    from mcpt_tpu.integrators import path as P
    from mcpt_tpu.models import bsdf as B
    from mcpt_tpu.models import emitter as emitters
    from mcpt_tpu.ops import rng
    from mcpt_tpu.ops.scene_intersect import scene_closest
    from mcpt_tpu.render.camera import generate_rays, make_camera
    from mcpt_tpu.scene.compile import compile_scene
    from mcpt_tpu.scene.parser import load_config

    cfg = load_config(xml)
    res = 512
    cfg.camera.width = cfg.camera.height = res
    scene = compile_scene(cfg)
    geom = scene.geom
    camera = make_camera(cfg.camera)
    print(
        f"chunks {geom.n_march_leaves} x {geom.march_leaf}; env "
        f"{scene.env_kind}",
        flush=True,
    )

    idx = jnp.arange(n, dtype=jnp.int32) % (res * res)
    o, d = generate_rays(camera, idx, 0.5, 0.5)
    seed = rng.pixel_seed(idx, 0)

    gh = scene_closest(scene, o, d)
    ht = P.interpolate_hit(scene, gh, o, d)
    seed, xib = rng.random_floats(seed, B.N_SAMPLE_DRAWS)
    wi, _, _, okb = B.bsdf_sample(
        scene.bsdf, P._stex(scene), scene.present_types, ht.bsdf_id, -d,
        ht.normal, ht.tangent, ht.bitangent, ht.inside, ht.uv, xib,
        kc=(scene.brdf_avg, scene.albedo_avg),
    )
    alive = np.asarray(ht.valid & okb)
    # continuation rays
    o2 = np.asarray(ht.position)
    d2 = np.asarray(-wi)
    coh = np.asarray(P._origin_chunk(scene, gh)) if P._use_origin_chunk(
        scene
    ) else np.full(n, -1, np.int64)
    # their true nearest hit caps the corridor
    gh2 = scene_closest(scene, jnp.asarray(o2), jnp.asarray(d2),
                        t_max=jnp.where(jnp.asarray(alive), 3.4e38, 0.0))
    t2 = np.asarray(jnp.where(gh2.valid, gh2.t, 3.4e38))

    # shadow rays (envmap NEE if present, else toward first area light)
    if scene.env_kind == "envmap":
        seed, x0 = rng.random_float(seed)
        seed, x1 = rng.random_float(seed)
        seed, x2 = rng.random_float(seed)
        wiE, distE, _, _, validE = emitters.sample_envmap(
            scene.env, scene.tex, ht.position, x0, x1, x2
        )
        so = o2
        sd = np.asarray(-wiE)
        st = np.asarray(jnp.where(validE & ht.valid, distE, 0.0))
        st = np.minimum(st, 3.4e38)
    else:
        so = sd = st = None

    cmin = np.asarray(geom.march_min)
    cmax = np.asarray(geom.march_max)
    real = cmin[:, 0] < 1e30

    def corridors_of(o_a, d_a, tcap, live):
        rcp = 1.0 / np.where(np.abs(d_a) < 1e-12, 1e-12, d_a)
        out = []
        # chunked to bound memory
        B_ = 8192
        for s in range(0, o_a.shape[0], B_):
            oo = o_a[s : s + B_, None, :]
            rr = rcp[s : s + B_, None, :]
            lo_t = (cmin[None] - oo) * rr
            hi_t = (cmax[None] - oo) * rr
            near = np.minimum(lo_t, hi_t).max(axis=2)
            far = np.maximum(lo_t, hi_t).min(axis=2)
            tc = tcap[s : s + B_, None]
            hit = (near <= far) & (far > 0) & (np.maximum(near, 0) <= tc)
            hit &= real[None, :]
            hit &= live[s : s + B_, None]
            for row in hit:
                nz = np.nonzero(row)[0]
                out.append(set(nz.tolist()) if nz.size else None)
        return out

    t0 = time.time()
    cor_cont = corridors_of(o2, d2, t2, alive)
    cor_cont_unpruned = corridors_of(
        o2, d2, np.full(n, 3.4e38, np.float32), alive
    )
    dist_stats("cont pruned ", cor_cont)
    dist_stats("cont unpruned", cor_cont_unpruned)
    print(f"continuation corridors in {time.time()-t0:.1f}s; mean "
          f"{np.mean([len(c) for c in cor_cont if c]):.2f}", flush=True)

    lo = np.asarray(geom.node_min[0])
    hi = np.asarray(geom.node_max[0])
    modes = ["octori", "chunk-oct-mor", "oct-chunk-mor", "chunk-mor",
             "mor-oct"]
    print("\n== continuation rays ==")
    for mmode in modes:
        k = keys_for(mmode, o2, d2, coh, lo, hi)
        tot, blocks, meanu, maxu = block_union_stats(k, cor_cont)
        print(f"{mmode:>15}: sum|union| {tot:7d}  blocks {blocks:4d}  "
              f"mean {meanu:6.1f}  max {maxu}", flush=True)

    if so is not None:
        live_s = st > 0
        cor_sh = corridors_of(so, sd, st, live_s)
        dist_stats("shadow", cor_sh)
        print(f"\n== shadow rays (envmap) == mean corridor "
              f"{np.mean([len(c) for c in cor_sh if c]):.2f}")
        for mmode in modes:
            k = keys_for(mmode, so, sd, coh, lo, hi)
            tot, blocks, meanu, maxu = block_union_stats(k, cor_sh)
            print(f"{mmode:>15}: sum|union| {tot:7d}  blocks {blocks:4d}"
                  f"  mean {meanu:6.1f}  max {maxu}", flush=True)




def dist_stats(tag, cors):
    ln = np.array([0 if c is None else len(c) for c in cors])
    live = ln[ln > 0]
    if live.size == 0:
        print(f"{tag}: no live rays")
        return
    q = np.percentile(live, [50, 90, 99, 99.9])
    print(f"{tag}: live {live.size}  mean {live.mean():.2f}  p50 {q[0]:.0f}"
          f"  p90 {q[1]:.0f}  p99 {q[2]:.0f}  p99.9 {q[3]:.0f}  max {live.max()}",
          flush=True)


if __name__ == "__main__":
    main()
