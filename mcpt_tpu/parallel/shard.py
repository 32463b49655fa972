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


def make_train_step(integ, spp: int, mesh: Mesh):
    """Differentiable render step: returns `step(scene, camera, pixel_idx,
    target) -> (loss, grads)` where grads are w.r.t. the differentiable
    texture leaves (color0/color1/atlas) — the BASELINE.json north-star
    estimator gradient — `psum`-reduced over the mesh.

    pixel_idx/target must be sharded over 'devices' (or any [N]/[N,3]
    arrays when jitted with shardings).
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("devices"), P("devices")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(scene, camera, pixel_idx, target):
        params = {
            "color0": scene.tex.color0,
            "color1": scene.tex.color1,
            "atlas": scene.tex.atlas,
        }

        def loss_fn(p):
            tex = scene.tex.replace(
                color0=p["color0"], color1=p["color1"], atlas=p["atlas"]
            )
            scene_p = scene.replace(tex=tex)
            img = render_pixels(
                scene_p, camera, integ, pixel_idx, spp, differentiable=True
            )
            # mean over the GLOBAL element set (pixels x 3 channels):
            # local sum / global count, psum'd below
            n_global = pixel_idx.shape[0] * mesh.devices.size * 3
            return jnp.sum((img - target) ** 2) / n_global

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.psum(loss, "devices")
        grads = jax.lax.psum(grads, "devices")
        return loss, grads

    return jax.jit(step)
