"""Per-stage device cost on ANY scene (generalizes nee_bench.py's
cornell-only breakdown).  K in-jit chained reps amortize the ~25 ms axon
dispatch floor.

    python scripts/stage_bench.py <scene.xml> [lanes] [K]
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from mcpt_tpu.integrators import path as P
from mcpt_tpu.models import emitter as emitters
from mcpt_tpu.ops import rng
from mcpt_tpu.ops.scene_intersect import scene_any, scene_closest
from mcpt_tpu.render.camera import generate_rays, make_camera
from mcpt_tpu.scene.compile import compile_scene
from mcpt_tpu.scene.parser import load_config


def bench(name, fn, K):
    @jax.jit
    def run():
        def body(acc, _):
            return fn(acc), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return acc

    run().block_until_ready()
    t0 = time.time()
    run().block_until_ready()
    print(f"{name:>22}: {(time.time()-t0)/K*1e3:8.3f} ms", flush=True)


def main():
    xml = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    bounce = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    cfg = load_config(xml)
    res = 512
    cfg.camera.width = cfg.camera.height = res
    scene = compile_scene(cfg)
    camera = make_camera(cfg.camera)
    idx = jnp.arange(n, dtype=jnp.int32) % (res * res)
    o, d = generate_rays(camera, idx, 0.5, 0.5)
    seed = rng.pixel_seed(idx, 0)

    # bounce > 0: advance the wavefront to that bounce so the traversal
    # sees the REAL mixed-direction ray population (the render loop is
    # ~7x slower per bounce than camera-ray stage numbers suggest)
    from mcpt_tpu.models import bsdf as _b

    for _ in range(bounce):
        gh = scene_closest(scene, o, d)
        ht = P.interpolate_hit(scene, gh, o, d)
        seed, xib = rng.random_floats(seed, _b.N_SAMPLE_DRAWS)
        wi, _, _, okb = _b.bsdf_sample(
            scene.bsdf, P._stex(scene), scene.present_types, ht.bsdf_id,
            -d, ht.normal, ht.tangent, ht.bitangent, ht.inside, ht.uv,
            xib, kc=(scene.brdf_avg, scene.albedo_avg))
        # dead/escaped lanes restart as fresh camera rays (regen-like mix)
        alive = ht.valid & okb
        o = jnp.where(alive[:, None], ht.position, o)
        d = jnp.where(alive[:, None], -wi, d)
    if bounce:
        print(f"(rays advanced to bounce {bounce})", flush=True)
    ghit = scene_closest(scene, o, d)
    hit = P.interpolate_hit(scene, ghit, o, d)
    _, xi = rng.random_floats(seed, max(P.nee_draw_count(scene), 8))
    jax.block_until_ready((hit, xi))
    print(f"lanes={n} prims={scene.geom.p0.shape if hasattr(scene.geom,'p0') else '?'} "
          f"env={scene.env_kind}", flush=True)

    def wob(acc):  # wobble inputs so the scan body can't be CSE'd
        return 1.0 - acc * 1e-12

    bench("closest", lambda acc: acc + jnp.sum(
        scene_closest(scene, o * wob(acc), d).t), K)
    bench("any-hit", lambda acc: acc + jnp.sum(scene_any(
        scene, o * wob(acc), d, t_min=1e-3, t_max=1e4).astype(jnp.float32)), K)
    bench("interp", lambda acc: acc + jnp.sum(P.interpolate_hit(
        scene, ghit._replace(t=ghit.t * wob(acc)), o, d).position), K)
    bench("NEE(full)", lambda acc: acc + jnp.sum(P._direct_lighting(
        scene, hit, -d, hit.valid, xi * wob(acc))), K)
    if scene.env_kind == "envmap":
        bench("env sample", lambda acc: acc + jnp.sum(emitters.sample_envmap(
            scene.env, scene.tex, hit.position,
            xi[0] * wob(acc), xi[1], xi[2])[2]), K)
        bench("env eval+pdf", lambda acc: acc + jnp.sum(
            emitters.eval_envmap(scene.env, scene.tex, d * wob(acc)))
            + jnp.sum(emitters.pdf_envmap(scene.env, scene.tex, d * wob(acc))), K)

    from mcpt_tpu.models import bsdf as bsdfs

    def bsample(acc):
        wi, pdf_b, f, ok = bsdfs.bsdf_sample(
            scene.bsdf, P._stex(scene), scene.present_types, hit.bsdf_id,
            -d, hit.normal, hit.tangent, hit.bitangent, hit.inside,
            hit.uv, xi[:bsdfs.N_SAMPLE_DRAWS] * wob(acc),
            kc=(scene.brdf_avg, scene.albedo_avg))
        return acc + jnp.sum(f) + jnp.sum(wi)

    bench("bsdf sample", bsample, K)

    def beval(acc):
        pdf, f, ok = P._bsdf_eval(scene, hit, -d * wob(acc), -d)
        return acc + jnp.sum(f) + jnp.sum(pdf)

    bench("bsdf eval", beval, K)


if __name__ == "__main__":
    main()
