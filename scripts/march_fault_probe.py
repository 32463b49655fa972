"""Bisect the on-chip fault in ops/pallas_march (runs fine in interpret
mode, faults the TPU worker on real hardware).  Each stage is a minimal
kernel run in a SUBPROCESS (a device fault poisons the in-process client
— memory/tpu-axon notes), growing from a static-index DMA to the full
while-loop march shape:

  s1   one DMA of tris[0]            (static index, 12 sublanes)
  s1b  same with 16-sublane layout   (tile-aligned extent)
  s2   DMA with ci from a vector min (dynamic scalar index)
  s3   DMA inside fori_loop          (static trip count)
  s4   DMA inside while_loop         (the production shape)

    python scripts/march_fault_probe.py [stage ...]
"""

import subprocess
import sys
import time

STAGE_SRC = r"""
import sys
sys.path.insert(0, "/root/repo")
import functools
import numpy as np, jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

stage = sys.argv[1]
LM, SUB, LS = 256, (16 if stage.endswith("b") else 12), 128
stage = stage.rstrip("b") if stage != "s1b" else "s1b"
tris = np.arange(LM * SUB * LS, dtype=np.float32).reshape(LM, SUB, LS)


def k_static(tris_ref, o_ref, scratch, sem):
    dma = pltpu.make_async_copy(tris_ref.at[0], scratch, sem)
    dma.start()
    dma.wait()
    o_ref[...] = scratch[...]


def k_dynamic(tris_ref, o_ref, scratch, sem):
    v = o_ref[...]  # junk input values; just need a vector
    ci = jnp.min(jnp.where(v[0:1, :] >= 0, 7, 3).astype(jnp.int32))
    dma = pltpu.make_async_copy(tris_ref.at[ci], scratch, sem)
    dma.start()
    dma.wait()
    o_ref[...] = scratch[...]


def k_fori(tris_ref, o_ref, scratch, sem):
    def body(i, acc):
        dma = pltpu.make_async_copy(tris_ref.at[i], scratch, sem)
        dma.start()
        dma.wait()
        return acc + scratch[...]

    o_ref[...] = jax.lax.fori_loop(0, 8, body, jnp.zeros((SUB, LS), jnp.float32))


def k_while(tris_ref, o_ref, scratch, sem):
    def cond(state):
        i, acc = state
        return i < 8

    def body(state):
        i, acc = state
        dma = pltpu.make_async_copy(tris_ref.at[i], scratch, sem)
        dma.start()
        dma.wait()
        return i + 1, acc + scratch[...]

    _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((SUB, LS), jnp.float32))
    )
    o_ref[...] = acc


kern = {"s1": k_static, "s1b": k_static, "s2": k_dynamic,
        "s3": k_fori, "s4": k_while}[stage]
out = pl.pallas_call(
    kern,
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((SUB, LS), jnp.float32),
    scratch_shapes=[pltpu.VMEM((SUB, LS), jnp.float32),
                    pltpu.SemaphoreType.DMA(())],
)(jnp.asarray(tris))
got = np.asarray(out)
if stage in ("s1", "s1b"):
    assert np.array_equal(got, tris[0]), "value mismatch"
elif stage == "s2":
    assert np.array_equal(got, tris[3]) or np.array_equal(got, tris[7])
else:
    assert np.array_equal(got, tris[:8].sum(0)), "sum mismatch"
print("STAGE", stage, "OK")
"""


def main():
    stages = sys.argv[1:] or ["s1", "s1b", "s2", "s3", "s4"]
    for s in stages:
        print(f"[probe] {s} ...", flush=True)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-c", STAGE_SRC, s],
            capture_output=True, text=True, timeout=1200,
        )
        ok = f"STAGE {s} OK" in p.stdout
        print(f"[probe] {s} {'OK' if ok else 'FAIL'} in "
              f"{time.time()-t0:.0f}s", flush=True)
        if not ok:
            tail = (p.stderr or p.stdout).strip().splitlines()[-6:]
            print("\n".join(tail), flush=True)
            # give the worker time to restart before the next stage
            time.sleep(90)


if __name__ == "__main__":
    main()
