"""Staged Pallas/Mosaic compile probe on the axon TPU.

Round-1 finding: the remote Mosaic compile of ops/pallas_dense.py hung
>25 min.  This probe compiles a ladder of kernels from trivial to the
production dense sweep, printing wall time per stage, so the first
hanging stage identifies the Mosaic feature that stalls the remote
compiler.  Run under `timeout -k 30 <s>`; each stage also prints BEFORE
compiling so a kill still leaves the ledger.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stage(name):
    print(f"[stage] {name} ...", flush=True)
    return time.time()


def done(t0):
    print(f"        ok in {time.time() - t0:.1f}s", flush=True)


def main():
    which = set(sys.argv[1:]) or None

    def want(k):
        return which is None or k in which

    if want("trivial"):
        t0 = stage("trivial: out = in * 2")

        def k_triv(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0

        x = jnp.ones((256, 256), jnp.float32)
        y = pl.pallas_call(
            k_triv,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        y.block_until_ready()
        assert float(y[0, 0]) == 2.0
        done(t0)

    if want("grid"):
        t0 = stage("grid: 4-step grid with index_map")

        def k_grid(x_ref, o_ref):
            o_ref[:] = x_ref[:] + 1.0

        x = jnp.ones((4, 128, 128), jnp.float32)
        y = pl.pallas_call(
            k_grid,
            grid=(4,),
            in_specs=[pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)
        y.block_until_ready()
        done(t0)

    if want("fori"):
        t0 = stage("fori: 32-trip fori_loop with [1024,128] body")

        def k_fori(x_ref, o_ref):
            def body(i, acc):
                return acc + x_ref[:, pl.ds(0, 128)] * (i + 1)

            o_ref[:] = jax.lax.fori_loop(0, 32, body,
                                         jnp.zeros((1024, 128), jnp.float32))

        x = jnp.ones((1024, 256), jnp.float32)
        y = pl.pallas_call(
            k_fori,
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        y.block_until_ready()
        done(t0)

    if want("reduce"):
        t0 = stage("reduce: min + one-hot argmin over lanes")

        def k_red(x_ref, o_ref):
            x = x_ref[:]
            m = jnp.min(x, axis=1, keepdims=True)
            iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            k = jnp.min(jnp.where(x == m, iota, 2**30), axis=1, keepdims=True)
            o_ref[:] = m + k.astype(jnp.float32)

        x = jnp.ones((1024, 128), jnp.float32)
        y = pl.pallas_call(
            k_red,
            out_shape=jax.ShapeDtypeStruct((1024, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        y.block_until_ready()
        done(t0)

    if want("sweep-mini"):
        t0 = stage("sweep-mini: dense_sweep G=1 R=256 P=256")
        from mcpt_tpu.ops.pallas_dense import dense_sweep

        rays = jnp.ones((1, 8, 256), jnp.float32)
        tris = jnp.ones((12, 256), jnp.float32)
        out = dense_sweep(rays, tris)
        jax.block_until_ready(out)
        done(t0)

    if want("sweep-full"):
        t0 = stage("sweep-full: dense_sweep G=16 R=1024 P=4096 (cornell shape)")
        from mcpt_tpu.ops.pallas_dense import dense_sweep

        rays = jnp.ones((16, 8, 1024), jnp.float32)
        tris = jnp.ones((12, 4096), jnp.float32)
        out = dense_sweep(rays, tris)
        jax.block_until_ready(out)
        done(t0)

    print("[probe] all requested stages passed", flush=True)


if __name__ == "__main__":
    main()
