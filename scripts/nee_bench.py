"""Sub-stage device cost of _nee_area (the NEE hot spot): CDF area-light
sampling, shadow any-hit, bsdf_evaluate, and the composed whole.
K=256 chained in-jit puts the ~30ms axon dispatch floor at ~0.1ms."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

from mcpt_tpu.integrators import path as P
from mcpt_tpu.ops import rng
from mcpt_tpu.ops.scene_intersect import scene_any, scene_closest
from mcpt_tpu.render.camera import generate_rays, make_camera
from mcpt_tpu.render.renderer import _freeze
from mcpt_tpu.scene.compile import compile_scene
from mcpt_tpu.scene.parser import load_config

def bench(name, fn, K=256):
    @jax.jit
    def run():
        def body(acc, _):
            return fn(acc), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return acc
    run().block_until_ready()
    t0 = time.time(); run().block_until_ready()
    print(f"{name:>26}: {(time.time()-t0)/K*1e3:8.3f} ms", flush=True)

def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    cfg = load_config("/root/reference/resources/scene/cornell-box/scene_v0.6.xml")
    cfg.camera.width = cfg.camera.height = 512
    scene = compile_scene(cfg)
    camera = make_camera(cfg.camera)
    idx = jnp.arange(n, dtype=jnp.int32) % (512 * 512)
    o, d = generate_rays(camera, idx, 0.5, 0.5)
    seed = rng.pixel_seed(idx, 0)
    ghit = scene_closest(scene, o, d)
    hit = P.interpolate_hit(scene, ghit, o, d)
    alive = hit.valid
    _, xi = rng.random_floats(seed, 3)
    jax.block_until_ready((hit, xi))
    print(f"lanes = {n}, n_emissive = {scene.n_emissive}", flush=True)

    def samp(acc):
        pos, nrm, rad, pdf = P._sample_area_light(
            scene, xi[0] * (1 - acc * 1e-12), xi[1], xi[2])
        return jnp.sum(pos) + jnp.sum(rad) + pdf.sum() + acc
    bench("_sample_area_light", samp)

    pos_l, n_l, radiance, pdf_area = P._sample_area_light(scene, xi[0], xi[1], xi[2])
    dvec = hit.position - pos_l
    dist = jnp.sqrt(jnp.maximum(jnp.sum(dvec * dvec, -1), 1e-20))
    wi = dvec / dist[..., None]
    jax.block_until_ready((wi, dist))

    def shadow(acc):
        occ = scene_any(scene, pos_l, wi, t_min=1e-3,
                        t_max=dist * (1 - acc * 1e-12))
        return jnp.sum(occ.astype(jnp.float32)) + acc
    bench("shadow any-hit", shadow)

    def beval(acc):
        pdf_eval, f, ok = P._bsdf_eval(
            scene, hit._replace(uv=hit.uv + acc * 1e-12), wi, -d)
        return jnp.sum(f) + acc
    bench("_bsdf_eval", beval)

    def whole(acc):
        L = P._nee_area(scene, hit._replace(uv=hit.uv + acc * 1e-12),
                        -d, alive, xi[0], xi[1], xi[2])
        return jnp.sum(L) + acc
    bench("_nee_area whole", whole)

main()
