"""Measured-roofline probe (VERDICT r1 weak #1: "no MFU/roofline
accounting").  Rather than quoting datasheet numbers, measure the
achievable peaks on THIS chip with microbenchmarks, then account each
render stage against them:

  * VPU fp32: a fused chain of K dependent FMAs over a [n] vector —
    flops = 2*K*n / t.
  * HBM bandwidth: y = x + 1 over a buffer far larger than VMEM —
    bytes = 2*size / t.
  * MXU: [4096,4096] @ [4096,4096] bf16 and f32.

Sync discipline (two prior versions of this probe reported impossible
peaks — 35 TB/s HBM, 178 TFLOP/s "VPU"): under the axon remote
runtime, `jax.block_until_ready` acknowledges scheduling, NOT device
completion, so any timing that ends in block_until_ready measures the
dispatch pipeline.  The only reliable sync is a device->host transfer
of the result.  Each measurement therefore

  1. runs ALL reps inside one jitted `lax.fori_loop` (a value-dependent
     chain the compiler cannot elide — outputs feed inputs),
  2. syncs by pulling one reduced scalar to the host, and
  3. takes the SLOPE between a small and a large rep count, cancelling
     the constant dispatch + transfer round-trip.

Stage accounting uses the analytic flop counts of the dense sweep
(~55 flop/ray-tri pair: Moller-Trumbore + window tests + winner
reduce) and the march kernel (~20 flop/ray-chunk slab + 55/ray-tri in
entered chunks) against the measured stage times from
scripts/stage_bench.py.

    python scripts/roofline_probe.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args):
    """Wall time of fn(*args) ending in a host transfer of a scalar."""
    t0 = time.time()
    out = fn(*args)
    np.asarray(out)  # device->host: the only real sync under axon
    return time.time() - t0


def slope(fn_r, x, r1, r2, warm=True):
    """Per-rep time via two-point slope: cancels dispatch + transfer."""
    f1 = functools.partial(fn_r, r1)
    f2 = functools.partial(fn_r, r2)
    if warm:
        np.asarray(f1(x)), np.asarray(f2(x))  # compile both
    t1 = min(timed(f1, x) for _ in range(3))
    t2 = min(timed(f2, x) for _ in range(3))
    return (t2 - t1) / (r2 - r1), t1, t2


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # --- host-sync round-trip floor
    @jax.jit
    def tiny(x):
        return x.sum()

    x8 = jnp.zeros((8,), jnp.float32)
    np.asarray(tiny(x8))
    floor = min(timed(tiny, x8) for _ in range(10))
    print(f"host-sync round-trip floor: {floor*1e3:.3f} ms", flush=True)

    # --- VPU fp32 peak: R dependent FMAs per element, in one program
    n = 1 << 22  # 16 MB vector

    @functools.partial(jax.jit, static_argnums=0)
    def vpu(r, x):
        def body(i, a):
            return a * 1.000001 + 0.5
        return jax.lax.fori_loop(0, r, body, x)[0]

    x = jnp.ones((n,), jnp.float32)
    per, t1, t2 = slope(vpu, x, 256, 2048)
    print(f"VPU fp32: {2*n/per/1e12:.3f} TFLOP/s  "
          f"(per-iter {per*1e6:.1f} us; walls {t1*1e3:.1f}/{t2*1e3:.1f} ms)",
          flush=True)

    # --- HBM bandwidth: dependent elementwise sweeps of a 512 MB buffer
    m = 1 << 27  # 128M f32 = 512 MB (>> 128 MB VMEM)

    @functools.partial(jax.jit, static_argnums=0)
    def bw(r, x):
        def body(i, a):
            return a + 1.0
        return jax.lax.fori_loop(0, r, body, x)[0]

    xb = jnp.ones((m,), jnp.float32)
    per, t1, t2 = slope(bw, xb, 4, 32)
    print(f"HBM: {2*m*4/per/1e9:.0f} GB/s  (per-sweep {per*1e3:.2f} ms)",
          flush=True)

    # --- MXU: chained 4096^3 matmuls (renormalized to stay finite)
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):

        @functools.partial(jax.jit, static_argnums=0)
        def mxu(r, a):
            def body(i, a):
                return (a @ a) * (1.0 / 4096.0)
            return jax.lax.fori_loop(0, r, body, a)[0, 0]

        a = jnp.ones((4096, 4096), dt)
        per, t1, t2 = slope(mxu, a, 4, 32)
        print(f"MXU {name}: {2*4096**3/per/1e12:.1f} TFLOP/s "
              f"(per-matmul {per*1e3:.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
