"""mcpt_tpu — a TPU-native Monte Carlo path tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference renderer `zhiwei-c/Monte-Carlo-Path-Tracing` (csrt): a
Mitsuba-compatible, differentiable, wavefront path tracer that runs on
TPU chips and scales over device meshes with `shard_map`.

Layer map (mirrors SURVEY.md but TPU-first):
  ops/          vectorized device math: RNG, warps, microfacet, intersection,
                BVH traversal (jnp + Pallas kernels)
  models/       shading models: BSDFs, emitters, media, textures (SoA tables)
  scene/        host-side scene compiler: Mitsuba-XML parser, mesh loaders,
                LBVH build, flat-array commit (the csrt "commit" pipeline)
  integrators/  wavefront path / volpath estimators (lax.while_loop bounces)
  render/       camera, film, renderer orchestration, progressive mode
  parallel/     mesh sharding: pixel shards over chips, psum film/grads
  utils/        image IO (PNG/EXR/HDR), timing, logging
"""

__version__ = "0.1.0"


def _force_f32_matmuls():
    """Renderer numerics require true-f32 contractions.

    JAX's DEFAULT matmul precision rounds f32 matmul/einsum operands to
    bfloat16 passes (on every backend in this jax build — verified even
    on CPU): light-sample positions, world transforms, and one-hot table
    selects would all quantize to ~3 decimal digits.  Physically based
    rendering accumulates across millions of such ops, so the package
    pins the default to float32; callers can override per-op or restore
    via jax.default_matmul_precision if they want bf16 throughput for
    a non-render workload.  MCPT_MATMUL_PRECISION overrides."""
    import os

    want = os.environ.get("MCPT_MATMUL_PRECISION", "float32")
    if want and want != "default":
        import jax

        jax.config.update("jax_default_matmul_precision", want)


_force_f32_matmuls()

_LAZY = {
    "Renderer": ("mcpt_tpu.render.renderer", "Renderer"),
    "load_config": ("mcpt_tpu.scene.parser", "load_config"),
    "compile_scene": ("mcpt_tpu.scene.compile", "compile_scene"),
    "RendererConfig": ("mcpt_tpu.scene.ir", "RendererConfig"),
    "make_mesh": ("mcpt_tpu.parallel.shard", "make_mesh"),
    "render_film_sharded": ("mcpt_tpu.parallel.shard", "render_film_sharded"),
    "make_train_step": ("mcpt_tpu.parallel.shard", "make_train_step"),
    "write_png": ("mcpt_tpu.utils.image", "write_png"),
    "write_exr": ("mcpt_tpu.utils.image", "write_exr"),
    "read_exr": ("mcpt_tpu.utils.image", "read_exr"),
}


def __getattr__(name):
    # Lazy public API so `import mcpt_tpu.ops.math` stays light.
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'mcpt_tpu' has no attribute {name!r}")
