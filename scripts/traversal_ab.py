"""Per-call A/B: block-march vs pair-scheduled traversal on a real
scene's bounce-mix wavefront, plus a phase breakdown of the pair path.

    python scripts/traversal_ab.py [xml] [n_log2] [bounce]
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np


def bench(name, fn, reps=10):
    jax.block_until_ready(fn())  # compile
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r)
    print(f"{name:>28}: {(time.time()-t0)/reps*1e3:8.3f} ms", flush=True)


def main():
    xml = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/resources/scene/matpreview/conductor.xml")
    nlog = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << nlog

    from mcpt_tpu.integrators import path as P
    from mcpt_tpu.models import bsdf as B
    from mcpt_tpu.ops import rng, traversal as T
    from mcpt_tpu.ops.scene_intersect import scene_closest
    from mcpt_tpu.render.camera import generate_rays, make_camera
    from mcpt_tpu.scene.compile import compile_scene
    from mcpt_tpu.scene.parser import load_config

    cfg = load_config(xml)
    cfg.camera.width = cfg.camera.height = 512
    scene = compile_scene(cfg)
    geom = scene.geom
    camera = make_camera(cfg.camera)
    idx = jnp.arange(n, dtype=jnp.int32) % (512 * 512)
    o, d = generate_rays(camera, idx, 0.5, 0.5)
    seed = rng.pixel_seed(idx, 0)
    gh = scene_closest(scene, o, d)
    ht = P.interpolate_hit(scene, gh, o, d)
    seed, xib = rng.random_floats(seed, B.N_SAMPLE_DRAWS)
    wi, _, _, okb = B.bsdf_sample(
        scene.bsdf, P._stex(scene), scene.present_types, ht.bsdf_id, -d,
        ht.normal, ht.tangent, ht.bitangent, ht.inside, ht.uv, xib,
        kc=(scene.brdf_avg, scene.albedo_avg))
    alive = ht.valid & okb
    o2 = jnp.where(alive[:, None], ht.position, o)
    d2 = jnp.where(alive[:, None], -wi, d)
    tmax = jnp.where(alive, 3.4e38, 0.0)
    jax.block_until_ready((o2, d2, tmax))
    print(f"lanes {n}  live {int(alive.sum())}  chunks "
          f"{geom.n_march_leaves} x {geom.march_leaf}", flush=True)

    wob = lambda i: 1.0 + 1e-12 * i

    def mk(fn):
        f = jax.jit(lambda o2, d2, tmax: fn(o2, d2, tmax))
        return lambda: f(o2, d2, tmax)

    bench("march closest", mk(lambda o2, d2, tmax: T._intersect_march_pallas(
        geom, o2, d2, 1e-4, tmax, False).t))
    bench("pairs closest", mk(lambda o2, d2, tmax: T._intersect_pairs(
        geom, o2, d2, 1e-4, tmax, False).t))
    bench("march any", mk(lambda o2, d2, tmax: T._intersect_march_pallas(
        geom, o2, d2, 1e-4, tmax, True).valid))
    bench("pairs any", mk(lambda o2, d2, tmax: T._intersect_pairs(
        geom, o2, d2, 1e-4, tmax, True).valid))

    # ---- pair-path phase breakdown ----------------------------------
    from mcpt_tpu.ops.intersect import intersect_aabb, safe_rcp
    from mcpt_tpu.ops.pallas_pairs import pair_block, pair_k, pair_sweep
    from jax import lax

    lm = geom.n_march_leaves
    k = pair_k()

    @jax.jit
    def phase_mask(o2, d2, tmax):
        t_min = jnp.full((n,), 1e-4, jnp.float32)
        d_rcp = safe_rcp(d2)
        hit_c, t_enter = intersect_aabb(
            o2[:, None, :], d_rcp[:, None, :],
            geom.march_min[None, :, :], geom.march_max[None, :, :],
            t_min[:, None], tmax[:, None])
        return hit_c & (t_enter < 1e30)

    bench("  phaseA slab[N,Lm]", lambda: phase_mask(o2, d2, tmax))

    mask0 = phase_mask(o2, d2, tmax)

    @jax.jit
    def phase_extract(mask):
        iota_l = lax.broadcasted_iota(jnp.int32, (n, lm), 1)
        m = mask
        outs = []
        for _ in range(k):
            ci = jnp.min(jnp.where(m, iota_l, lm), axis=1)
            outs.append(ci)
            m = m & (iota_l != ci[:, None])
        return jnp.stack(outs, axis=1)

    bench("  extract K slots", lambda: phase_extract(mask0))
    pc0 = phase_extract(mask0).reshape(n * k)

    @jax.jit
    def phase_sort(pc):
        rep = lambda a: jnp.broadcast_to(a[:, None], (n, k)).reshape(n * k)
        return lax.sort(
            (pc, jnp.arange(n * k, dtype=jnp.int32),
             rep(o2[:, 0]), rep(o2[:, 1]), rep(o2[:, 2]),
             rep(d2[:, 0]), rep(d2[:, 1]), rep(d2[:, 2]),
             rep(jnp.full((n,), 1e-4, jnp.float32)), rep(tmax)),
            dimension=0, num_keys=1, is_stable=False)[0]

    bench("  fwd sort 10col", lambda: phase_sort(pc0))

    # kernel alone (pre-sorted input)
    srt = jax.jit(lambda pc: lax.sort(
        (pc, jnp.arange(n * k, dtype=jnp.int32)), dimension=0,
        num_keys=1, is_stable=False))(pc0)
    pc_s = srt[0]
    r = pair_block()
    g = -(-(n * k) // r)
    pad = g * r

    def pad1(a, fill=0.0):
        return jnp.concatenate([a, jnp.full((pad - n * k,), fill, a.dtype)]) if pad != n * k else a

    rep = lambda a: jnp.broadcast_to(a[:, None], (n, k)).reshape(n * k)
    zeros = jnp.zeros((pad,), jnp.float32)
    rays_p = jnp.stack([
        pad1(rep(o2[:, 0])), pad1(rep(o2[:, 1])), pad1(rep(o2[:, 2])),
        pad1(rep(d2[:, 0])), pad1(rep(d2[:, 1])), pad1(rep(d2[:, 2], )),
        pad1(rep(jnp.full((n,), 1e-4, jnp.float32))),
        pad1(jnp.where(pc_s >= lm, 0.0, rep(tmax))),
        pad1(pc_s.astype(jnp.float32), fill=float(lm)),
        zeros, zeros, zeros, zeros, zeros, zeros, zeros,
    ]).reshape(16, g, r).swapaxes(0, 1)
    tris = T._pair_tris_pack(geom)
    jax.block_until_ready((rays_p, tris))
    kf = jax.jit(lambda rp: pair_sweep(rp, tris, any_hit=False)[0])
    bench("  kernel only", lambda: kf(rays_p))

    # fallback call (all-dead)
    fb = jax.jit(lambda o2, d2: T._intersect_march_pallas(
        geom, o2, d2, 1e-4, jnp.zeros((n,)), False).t)
    bench("  fallback all-dead march", lambda: fb(o2, d2))


if __name__ == "__main__":
    main()
