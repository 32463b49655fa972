"""Renderer orchestration (csrt src/renderer/renderer.cpp Draw path).

The reference dispatches one CUDA thread per pixel running the full spp
loop.  Here the film is rendered in pixel tiles: one jitted function
shades a [TILE] ray wavefront for one sample and a `lax.fori_loop`
accumulates spp samples (sample index s gives the reference's stratified
jitter u = s/spp, v = VdC2(s+1), renderer.cpp:68-75).  Tiles bound device
memory; the tile function compiles once per (tile, spp) shape.

Sharding: `render` accepts an optional device mesh — tiles are then
sharded over the mesh's 'devices' axis with identical per-pixel RNG, so
the image is bit-identical whatever the mesh (SURVEY §5 determinism).
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.integrators import path as path_integrator
from mcpt_tpu.integrators import volpath as volpath_integrator
from mcpt_tpu.ops import rng
from mcpt_tpu.render.camera import Camera, generate_rays, make_camera
from mcpt_tpu.scene.compile import SceneData, compile_scene
from mcpt_tpu.scene.ir import IntegratorInfo, RendererConfig


def render_pixels(scene: SceneData, camera: Camera, integ, pixel_idx,
                  spp: int, frame_base: int = 0,
                  differentiable: bool = False):
    """Traceable body: average `spp` samples for a batch of linear pixel
    indices.  Use :func:`render_tile` for the jitted entry point; this is
    also what `parallel.shard` wraps in `shard_map`."""
    n = pixel_idx.shape[0]
    seed0 = rng.pixel_seed(pixel_idx, frame_base)
    acc0 = jnp.zeros((n, 3), jnp.float32)
    shade = (
        volpath_integrator.shade
        if integ.itype == "volpath"
        else path_integrator.shade
    )

    def body(s, carry):
        acc, seed = carry
        u = s.astype(jnp.float32) / spp
        v = rng.van_der_corput_base2(jnp.asarray(s + 1, jnp.uint32))
        o, d = generate_rays(camera, pixel_idx, u, v)
        radiance, seed = shade(
            scene, integ, o, d, seed, differentiable=differentiable
        )
        if integ.sample_clamp > 0:
            radiance = jnp.minimum(radiance, integ.sample_clamp)
        return acc + radiance, seed

    if differentiable:
        # fori_loop is fine under reverse AD only with static trip count
        # unrolled by scan; spp is static here so scan it.
        def scan_body(carry, s):
            return body(s, carry), None

        (acc, _), _ = jax.lax.scan(
            scan_body, (acc0, seed0), jnp.arange(spp)
        )
    else:
        acc, _ = jax.lax.fori_loop(0, spp, body, (acc0, seed0))
    return acc / spp


@functools.partial(jax.jit, static_argnames=("integ", "spp"))
def render_tile(scene: SceneData, camera: Camera, integ: IntegratorInfo,
                pixel_idx, spp: int, frame_base=0):
    """Jitted single-device tile renderer (`frame_base` is traced so
    progressive accumulation reuses one compilation)."""
    return render_pixels(scene, camera, integ, pixel_idx, spp, frame_base)


class Renderer:
    """Facade: config -> committed scene -> film (csrt RayTracer)."""

    def __init__(self, config: RendererConfig):
        self.config = config
        self.scene = compile_scene(config)
        self.camera = make_camera(config.camera)
        self.integrator = config.integrator

    def render(self, spp: int | None = None, tile: int = 1 << 16,
               frame_base: int = 0, progress: bool = False) -> np.ndarray:
        """Render the full frame; returns linear-light [H, W, 3] float32."""
        cam = self.camera
        n_pix = cam.width * cam.height
        spp = spp or cam.spp
        integ = _freeze(self.integrator)

        frame = np.zeros((n_pix, 3), np.float32)
        t0 = time.time()
        for start in range(0, n_pix, tile):
            end = min(start + tile, n_pix)
            idx = jnp.arange(start, end, dtype=jnp.int32)
            if end - start < tile:  # keep one compiled shape
                idx = jnp.concatenate(
                    [idx, jnp.zeros(tile - (end - start), jnp.int32)]
                )
            out = render_tile(self.scene, cam, integ, idx, spp, frame_base)
            frame[start:end] = np.asarray(out)[: end - start]
            if progress:
                pct = 100.0 * end / n_pix
                eta = (time.time() - t0) / end * (n_pix - end)
                print(f"\r[info] render {pct:5.1f}%  eta {eta:6.1f}s",
                      end="", flush=True)
        if progress:
            print(f"\r[info] render done in {time.time() - t0:.2f}s      ")
        return frame.reshape(cam.height, cam.width, 3)


def _freeze(integ: IntegratorInfo):
    """IntegratorInfo as a hashable static jit arg."""
    return _FrozenInteg(
        itype=integ.itype,
        depth_max=integ.depth_max,
        depth_rr=integ.depth_rr,
        pdf_rr=integ.pdf_rr,
        hide_emitters=integ.hide_emitters,
        sample_clamp=integ.sample_clamp,
    )


class _FrozenInteg(NamedTuple):
    itype: str
    depth_max: int
    depth_rr: int
    pdf_rr: float
    hide_emitters: bool
    sample_clamp: float
