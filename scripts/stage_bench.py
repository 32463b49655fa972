"""Per-stage device cost of one bounce iteration, measured by chaining
each stage K times inside one jit.  K must be large: the axon tunnel
round-trip is ~30 ms, so K=256 puts the dispatch floor at ~0.1 ms.

Stages: closest trace, any-hit trace, hit interpolation, NEE direct
lighting, BSDF sample, full bounce body reference.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, args, K=256):
    @jax.jit
    def run(*a):
        def body(acc, _):
            out = fn(*a, acc)
            return out, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return acc

    run(*args).block_until_ready()
    t0 = time.time()
    run(*args).block_until_ready()
    dt = (time.time() - t0) / K
    print(f"{name:>24}: {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    from mcpt_tpu.integrators import path as P
    from mcpt_tpu.models import bsdf as bsdfs
    from mcpt_tpu.ops import rng
    from mcpt_tpu.ops.scene_intersect import scene_any, scene_closest
    from mcpt_tpu.render.camera import generate_rays, make_camera
    from mcpt_tpu.render.renderer import _freeze
    from mcpt_tpu.scene.compile import compile_scene
    from mcpt_tpu.scene.parser import load_config

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16

    cfg = load_config(
        "/root/reference/resources/scene/cornell-box/scene_v0.6.xml"
    )
    cfg.camera.width = cfg.camera.height = 512
    cfg.integrator.depth_max = 8
    scene = compile_scene(cfg)
    camera = make_camera(cfg.camera)
    integ = _freeze(cfg.integrator)

    idx = jnp.arange(n, dtype=jnp.int32) % (512 * 512)
    o, d = generate_rays(camera, idx, 0.5, 0.5)
    seed = rng.pixel_seed(idx, 0)
    ghit = scene_closest(scene, o, d)
    hit = P.interpolate_hit(scene, ghit, o, d)
    alive = hit.valid
    n_nee = P.nee_draw_count(scene)
    _, xi_nee = rng.random_floats(seed, n_nee)
    _, xi_b = rng.random_floats(seed, bsdfs.N_SAMPLE_DRAWS)
    jax.block_until_ready((hit, xi_nee))

    print(f"lanes = {n}", flush=True)

    bench("closest trace", lambda o_, d_, acc: jnp.sum(
        scene_closest(scene, o_ + acc * 1e-12, d_).t % 1.0
    ), (o, d))

    bench("any-hit trace", lambda o_, d_, acc: jnp.sum(
        scene_any(scene, o_ + acc * 1e-12, d_,
                  t_max=jnp.full(n, 2.0)).astype(jnp.float32)
    ) + acc, (o, d))

    def interp(o_, d_, acc):
        h = P.interpolate_hit(scene, ghit._replace(
            t=ghit.t + acc * 1e-12), o_, d_)
        return jnp.sum(h.normal) + jnp.sum(h.uv) + acc

    bench("interpolate_hit", interp, (o, d))

    def nee(acc):
        L = P._direct_lighting(
            scene, hit._replace(t=hit.t + acc * 1e-12), -d, alive, xi_nee
        )
        return jnp.sum(L) + acc

    bench("NEE (all emitters)", nee, ())

    def bs(acc):
        wi, pdf, f, ok = bsdfs.bsdf_sample(
            scene.bsdf, scene.tex, scene.present_types, hit.bsdf_id,
            -d, hit.normal, hit.tangent, hit.bitangent, hit.inside,
            hit.uv, xi_b + acc * 1e-12,
            kc=(scene.brdf_avg, scene.albedo_avg),
        )
        return jnp.sum(f) + jnp.sum(wi) + acc

    bench("bsdf_sample", bs, ())

    def beval(acc):
        pdf, f, ok = bsdfs.bsdf_evaluate(
            scene.bsdf, scene.tex, scene.present_types, hit.bsdf_id,
            -d, d, hit.normal, hit.tangent, hit.bitangent, hit.inside,
            hit.uv, kc=(scene.brdf_avg, scene.albedo_avg),
        )
        return jnp.sum(f) + acc

    bench("bsdf_evaluate x1", beval, ())

    def rng_cost(acc):
        s = seed + acc.astype(jnp.uint32)
        s, x = rng.random_floats(s, n_nee + bsdfs.N_SAMPLE_DRAWS + 1)
        return jnp.sum(x) + acc

    bench("rng draws/bounce", rng_cost, ())


if __name__ == "__main__":
    main()
