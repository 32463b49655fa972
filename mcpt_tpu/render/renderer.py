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

from mcpt_tpu.integrators import bdpt as bdpt_integrator
from mcpt_tpu.integrators import path as path_integrator
from mcpt_tpu.integrators import volpath as volpath_integrator
from mcpt_tpu.ops import rng
from mcpt_tpu.render.camera import Camera, generate_rays, make_camera
from mcpt_tpu.scene.compile import SceneData, compile_scene
from mcpt_tpu.scene.ir import IntegratorInfo, RendererConfig


def render_pixels(scene: SceneData, camera: Camera, integ, pixel_idx,
                  spp: int, frame_base=0,
                  differentiable: bool = False,
                  spp_total: int | None = None, sample_offset=0):
    """Traceable body: average `spp` samples for a batch of linear pixel
    indices.  Use :func:`render_tile` for the jitted entry point; this is
    also what `parallel.shard` wraps in `shard_map`.

    `sample_offset`/`spp_total` let callers split one logical
    `spp_total`-sample render into chunks without repeating sub-pixel
    strata: u = (offset+s)/spp_total, v = VdC2(frame_base+offset+s+1)
    (the reference's stratified jitter, renderer.cpp:68-75)."""
    n = pixel_idx.shape[0]
    if spp_total is None:
        spp_total = spp
    base = jnp.asarray(frame_base, jnp.uint32) + jnp.asarray(
        sample_offset, jnp.uint32
    )
    seed0 = rng.pixel_seed(pixel_idx, base)
    acc0 = jnp.zeros((n, 3), jnp.float32)
    shade = {
        "volpath": volpath_integrator.shade,
        "bdpt": bdpt_integrator.shade,
    }.get(integ.itype, path_integrator.shade)

    def body(s, carry):
        acc, seed = carry
        s_g = jnp.asarray(sample_offset, jnp.float32) + s.astype(jnp.float32)
        u = s_g / spp_total
        v = rng.van_der_corput_base2(base + jnp.asarray(s + 1, jnp.uint32))
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


def _render_tile_impl(scene: SceneData, camera: Camera,
                      integ: IntegratorInfo, pixel_idx, spp: int,
                      frame_base=0, spp_total=None, sample_offset=0):
    return render_pixels(
        scene, camera, integ, pixel_idx, spp, frame_base,
        spp_total=spp_total, sample_offset=sample_offset,
    )


def _render_tile_regen_impl(scene: SceneData, camera: Camera,
                            integ: IntegratorInfo, pixel_idx, spp: int,
                            frame_base=0, spp_total=None, sample_offset=0):
    shade_regen = (
        volpath_integrator.shade_regen if integ.itype == "volpath"
        else path_integrator.shade_regen
    )
    film, _ = shade_regen(
        scene, camera=camera, integ=integ, pixel_idx=pixel_idx, spp=spp,
        frame_base=frame_base, spp_total=spp_total,
        sample_offset=sample_offset,
    )
    return film


_TILE_STATIC = ("integ", "spp", "spp_total")


@jax.jit
def _scale_film(film, s):
    return film * s


@jax.jit
def _add_films(acc, contrib):
    return acc + contrib

#: Jitted single-device tile renderer (`frame_base`/`sample_offset` are
#: traced so chunked accumulation reuses one compilation).
render_tile = functools.partial(
    jax.jit, static_argnames=_TILE_STATIC
)(_render_tile_impl)

#: Jitted tile renderer on the fused regeneration wavefront
#: (integrators.path.shade_regen) — path integrator only.
render_tile_regen = functools.partial(
    jax.jit, static_argnames=_TILE_STATIC
)(_render_tile_regen_impl)


# The axon remote TPU compiler SIGILLs deterministically inside its
# priority-fusion cost model on certain programs (round-1/2 example:
# rough-diffuse NEE against an emissive-disk light — mercury/
# rough_diffuse.xml).  When a tile compile dies that way, the renderer
# retries the tile with these per-compile XLA option overrides
# (compile-request proto, so they survive the service's env scrubbing).
# Override with MCPT_XLA_FALLBACK_OPTS="k=v;k2=v2"; set empty to disable.
_FALLBACK_DEFAULT = "xla_disable_hlo_passes=fusion"
_fallback_cache: dict = {}


def _tile_fallback(engine: str):
    import os

    spec = os.environ.get("MCPT_XLA_FALLBACK_OPTS", _FALLBACK_DEFAULT)
    if not spec:
        return None
    key = (engine, spec)
    if key not in _fallback_cache:
        opts = dict(kv.split("=", 1) for kv in spec.split(";"))
        impl = (_render_tile_regen_impl if engine == "regen"
                else _render_tile_impl)
        _fallback_cache[key] = jax.jit(
            impl, static_argnames=_TILE_STATIC, compiler_options=opts
        )
    return _fallback_cache[key]


def _is_compiler_crash(err: Exception) -> bool:
    msg = str(err)
    return "remote_compile" in msg and (
        "SIGILL" in msg or "signal" in msg or "INTERNAL" in msg
    )


class Renderer:
    """Facade: config -> committed scene -> film (csrt RayTracer)."""

    def __init__(self, config: RendererConfig):
        import os

        # config-tier perf knobs (ir.RendererConfig.perf) become MCPT_*
        # env DEFAULTS before the scene commit reads them — explicit env
        # vars still win, so ops overrides stay possible while a render
        # is reproducible from the scene file alone (SURVEY §5 config)
        for key, value in getattr(config, "perf", {}).items():
            os.environ.setdefault(
                "MCPT_" + key.upper().replace(".", "_"), str(value)
            )
        self.config = config
        self.scene = compile_scene(config)
        self.camera = make_camera(config.camera)
        self.integrator = config.integrator

    def render(self, spp: int | None = None, tile: int = 1 << 16,
               frame_base: int = 0, progress: bool = False,
               spp_chunk: int = 8, engine: str | None = None) -> np.ndarray:
        """Render the full frame; returns linear-light [H, W, 3] float32.

        Work is dispatched in (tile, spp_chunk) pieces so no single XLA
        execution runs long — keeps device watchdogs happy and gives
        progress/preemption points (the reference's Morton-patch queue
        serves the same purpose on CPU, renderer.cpp:142-253).

        engine: 'regen' (default for the path integrator) fuses the spp
        and depth loops with ray regeneration (shade_regen); 'chunked'
        is the per-sample wavefront.  MCPT_ENGINE overrides the default.
        """
        import os

        cam = self.camera
        n_pix = cam.width * cam.height
        spp = spp or cam.spp
        integ = _freeze(self.integrator)
        if engine is None:
            engine = os.environ.get(
                "MCPT_ENGINE",
                "regen" if integ.itype != "bdpt" else "chunked",
            )
        tile_fn = render_tile_regen if engine == "regen" else render_tile
        spp_chunk = min(spp_chunk, spp)
        # sample counts per chunk (last may be short; reuses the compile
        # only when equal, so prefer divisors)
        chunks = [spp_chunk] * (spp // spp_chunk)
        if spp % spp_chunk:
            chunks.append(spp % spp_chunk)

        frame = np.zeros((n_pix, 3), np.float32)
        t0 = time.time()
        state = {"done": 0, "tile_fn": tile_fn}
        total_work = n_pix * spp

        def dispatch_tile(start, end, idx):
            """Queue one tile's spp chunks (NO device sync — dispatches
            stay pipelined; the axon round-trip is ~24 ms, which would
            serialize fast scenes 3-4x if paid per chunk)."""
            acc = None
            s_done = 0
            for s in chunks:
                try:
                    out = state["tile_fn"](
                        self.scene, cam, integ, idx, s, frame_base,
                        spp_total=spp, sample_offset=s_done,
                    )
                except jax.errors.JaxRuntimeError as err:
                    fb = _tile_fallback(engine)
                    if fb is None or not _is_compiler_crash(err):
                        raise
                    import warnings

                    warnings.warn(
                        "remote TPU compile crashed; retrying tile with "
                        "XLA fallback options (see renderer.py): "
                        f"{type(err).__name__}"
                    )
                    state["tile_fn"] = fb
                    out = state["tile_fn"](
                        self.scene, cam, integ, idx, s, frame_base,
                        spp_total=spp, sample_offset=s_done,
                    )
                contrib = _scale_film(out, float(s))
                acc = contrib if acc is None else _add_films(acc, contrib)
                s_done += s
                state["done"] += (end - start) * s
                if progress:
                    pct = 100.0 * state["done"] / total_work
                    eta = (time.time() - t0) / state["done"] * (
                        total_work - state["done"]
                    )
                    print(
                        f"\r[info] render {pct:5.1f}%  eta {eta:6.1f}s",
                        end="",
                        flush=True,
                    )
            try:  # start the host copy without blocking the next tile
                acc.copy_to_host_async()
            except AttributeError:
                pass
            return acc

        # Per-chunk films accumulate ON DEVICE and each tile is fetched
        # once, asynchronously: a synchronous np.asarray per (tile,
        # spp-chunk) costs more than the render itself through the axon
        # tunnel (jax.profiler trace, docs/profile/SUMMARY.md — 265 ms
        # per 768 KB readback vs 211 ms device compute per tile).
        pending: list[tuple[int, int, jax.Array, jax.Array]] = []
        for start in range(0, n_pix, tile):
            end = min(start + tile, n_pix)
            idx = jnp.arange(start, end, dtype=jnp.int32)
            if end - start < tile:  # keep one compiled shape
                idx = jnp.concatenate(
                    [idx, jnp.zeros(tile - (end - start), jnp.int32)]
                )
            try:
                acc = dispatch_tile(start, end, idx)
            except jax.errors.JaxRuntimeError as err:
                import warnings

                warnings.warn(
                    f"tile [{start}:{end}] dispatch failed "
                    f"({type(err).__name__}); re-rendering at fetch"
                )
                acc = None  # the fetch loop below re-renders it
            pending.append((start, end, idx, acc))

        # Elastic tile recovery (SURVEY §5 failure row): device faults on
        # async dispatches surface at fetch; per-pixel RNG is a pure
        # function of (pixel, sample), so a lost tile is simply
        # re-rendered — the retry produces the IDENTICAL contribution
        # (idempotent recovery, tests/test_renderer_elastic.py).
        retries = int(os.environ.get("MCPT_TILE_RETRIES", "2"))
        for start, end, idx, acc in pending:
            for attempt in range(retries + 1):
                try:
                    if acc is None:
                        acc = dispatch_tile(start, end, idx)
                    frame[start:end] = np.asarray(acc)[: end - start] / spp
                    break
                except jax.errors.JaxRuntimeError as err:
                    if attempt >= retries:
                        raise
                    import warnings

                    warnings.warn(
                        f"tile [{start}:{end}] lost ({type(err).__name__});"
                        f" re-rendering (attempt {attempt + 1})"
                    )
                    acc = None
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
