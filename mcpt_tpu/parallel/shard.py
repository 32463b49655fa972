"""Device-mesh scaling: pixel shards over chips (the TPU-native analogue
of the reference's CPU patch scheduler / CUDA grid, SURVEY.md §2.7).

Design (scaling-book recipe): 1-D mesh over all chips, scene tables
replicated (broadcast once, like `cudaMallocManaged` replication —
csrt include/csrt/utils/memory.hpp), the film pixel axis sharded.  Each
chip shades its own pixel shard with the SAME per-pixel deterministic RNG
(Tea/LCG keyed by pixel id — mcpt_tpu.ops.rng), so the rendered image is
bit-identical for any mesh size.  The only collectives are a `psum` of
parameter gradients in the differentiable path and the implicit
all-gather of the film on host fetch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mcpt_tpu.render.renderer import render_pixels


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices; axis name 'devices'."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), ("devices",))


def _pad_to(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def render_film_sharded(scene, camera, integ, mesh: Mesh, spp: int,
                        frame_base: int = 0):
    """Render the full film with pixels sharded over `mesh`.

    Returns [H*W, 3] float32 (unsharded on fetch).  Identical output to
    the single-device path for any device count.
    """
    n_pix = camera.width * camera.height
    n_dev = mesh.devices.size
    n_pad = _pad_to(n_pix, n_dev)
    pixel_idx = jnp.arange(n_pad, dtype=jnp.int32) % n_pix

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("devices")),
        out_specs=P("devices"),
        check_vma=False,
    )
    def tile_fn(scene_, camera_, idx):
        return render_pixels(scene_, camera_, integ, idx, spp, frame_base)

    out = jax.jit(tile_fn)(scene, camera, pixel_idx)
    return out[:n_pix]


# Gradient parameter families (BASELINE.json north star: "material,
# texture, and emitter parameters").  Each family maps to concrete scene
# pytree leaves; derived quantities (inverse eta, average Fresnel, KC
# normalizations) are recomputed IN-TRACE by `apply_params` so their
# sensitivities flow into the gradient.
PARAM_FAMILIES = ("textures", "bsdf", "emitters", "media")


def select_params(scene, families=("textures",)):
    """Extract the differentiable leaves for the requested families."""
    p = {}
    if "textures" in families:
        p["tex.color0"] = scene.tex.color0
        p["tex.color1"] = scene.tex.color1
        p["tex.atlas"] = scene.tex.atlas
    if "bsdf" in families:
        p["bsdf.eta"] = scene.bsdf.eta
        p["bsdf.reflectivity_rgb"] = scene.bsdf.reflectivity_rgb
        p["bsdf.edgetint_rgb"] = scene.bsdf.edgetint_rgb
    if "emitters" in families:
        p["em.intensity"] = scene.emitters.intensity
        p["em.radiance"] = scene.emitters.radiance
    if "media" in families:
        p["med.sigma_s"] = scene.media.sigma_s
        p["med.sigma_t"] = scene.media.sigma_t
    return p


def apply_params(scene, p):
    """Write parameter leaves back into the scene pytree, recomputing
    the host-committed derived tables (BsdfTables eta_inv/reflectivity/
    f_avg*, csrt bsdf.cpp:115-188) inside the trace so reverse-mode AD
    sees the full dependency."""
    from mcpt_tpu.ops.microfacet import (
        average_fresnel_rgb_jnp,
        average_fresnel_scalar_jnp,
    )

    if "tex.color0" in p:
        scene = scene.replace(tex=scene.tex.replace(
            color0=p["tex.color0"], color1=p["tex.color1"],
            atlas=p["tex.atlas"],
        ))
    if "bsdf.eta" in p:
        eta = p["bsdf.eta"]
        refl_rgb = p["bsdf.reflectivity_rgb"]
        edge_rgb = p["bsdf.edgetint_rgb"]
        scene = scene.replace(bsdf=scene.bsdf.replace(
            eta=eta,
            eta_inv=1.0 / eta,
            reflectivity=((eta - 1.0) / (eta + 1.0)) ** 2,
            f_avg=average_fresnel_scalar_jnp(eta),
            f_avg_inv=average_fresnel_scalar_jnp(1.0 / eta),
            reflectivity_rgb=refl_rgb,
            edgetint_rgb=edge_rgb,
            f_avg_rgb=average_fresnel_rgb_jnp(refl_rgb, edge_rgb),
        ))
    if "em.intensity" in p:
        scene = scene.replace(emitters=scene.emitters.replace(
            intensity=p["em.intensity"], radiance=p["em.radiance"],
        ))
    if "med.sigma_s" in p:
        # sampling_weight stays fixed: it is a sampling *choice*, not a
        # physical parameter — differentiating through it would need
        # score-function terms the estimator doesn't carry.
        scene = scene.replace(media=scene.media.replace(
            sigma_s=p["med.sigma_s"], sigma_t=p["med.sigma_t"],
        ))
    return scene


def make_train_step(integ, spp: int, mesh: Mesh,
                    families: tuple = ("textures",),
                    grad_chunks: int = 1):
    """Differentiable render step: returns `step(scene, camera, pixel_idx,
    target) -> (loss, grads)` where grads cover the requested parameter
    `families` (see PARAM_FAMILIES) — the BASELINE.json north-star
    estimator gradient — `psum`-reduced over the mesh.

    pixel_idx/target must be sharded over 'devices' (or any [N]/[N,3]
    arrays when jitted with shardings).

    grad_chunks > 1 splits each device's pixel shard into that many
    `lax.scan` steps with a per-chunk grad psum, so the all-reduce of
    chunk k can overlap the backward pass of chunk k+1 (the scaling-book
    comms/compute-overlap recipe; matters once grads cross DCN in the
    multi-host path).  The summed result is bit-comparable to
    grad_chunks=1 up to float re-association.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("devices"), P("devices")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(scene, camera, pixel_idx, target):
        params = select_params(scene, families)
        n_local = pixel_idx.shape[0]
        n_global = n_local * mesh.devices.size * 3

        def chunk_loss_and_psummed_grad(p, idx_c, tgt_c):
            def loss_fn(p_):
                scene_p = apply_params(scene, p_)
                img = render_pixels(
                    scene_p, camera, integ, idx_c, spp,
                    differentiable=True,
                )
                # sum here, normalized by the GLOBAL element count;
                # psum completes the global mean
                return jnp.sum((img - tgt_c) ** 2) / n_global

            loss, grads = jax.value_and_grad(loss_fn)(p)
            return jax.lax.psum(loss, "devices"), jax.lax.psum(
                grads, "devices"
            )

        if grad_chunks <= 1 or n_local % grad_chunks:
            return chunk_loss_and_psummed_grad(params, pixel_idx, target)

        idx_cs = pixel_idx.reshape(grad_chunks, n_local // grad_chunks)
        tgt_cs = target.reshape(grad_chunks, n_local // grad_chunks, 3)

        def scan_body(carry, xs):
            loss_acc, grad_acc = carry
            loss_c, grads_c = chunk_loss_and_psummed_grad(params, *xs)
            return (
                loss_acc + loss_c,
                jax.tree.map(jnp.add, grad_acc, grads_c),
            ), None

        zero = (
            jnp.zeros((), jnp.float32),
            jax.tree.map(jnp.zeros_like, params),
        )
        (loss, grads), _ = jax.lax.scan(scan_body, zero, (idx_cs, tgt_cs))
        return loss, grads

    return jax.jit(step)
