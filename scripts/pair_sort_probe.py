"""Go/no-go numbers for the pair-scheduled march (r5): cost of the
variadic pair sorts and of wide row gathers at pair-wavefront sizes.

    python scripts/pair_sort_probe.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np


def bench(name, fn, reps=3):
    fn()  # compile
    jax.block_until_ready(fn())
    t0 = time.time()
    K = 20
    for _ in range(K):
        r = fn()
    jax.block_until_ready(r)
    print(f"{name:>40}: {(time.time()-t0)/K*1e3:8.3f} ms", flush=True)


def main():
    rs = np.random.RandomState(0)
    for n_log, cols in [(16, 10), (19, 10), (19, 6), (19, 2), (20, 10)]:
        n = 1 << n_log
        keys = jnp.asarray(rs.randint(0, 1 << 29, n), jnp.int32)
        pay = [jnp.asarray(rs.rand(n), jnp.float32) for _ in range(cols - 1)]

        @jax.jit
        def srt(keys=keys, pay=tuple(pay)):
            out = jax.lax.sort((keys,) + tuple(pay), dimension=0,
                               num_keys=1, is_stable=False)
            return out[1]

        bench(f"sort {n>>10}k x {cols} cols", srt)

    # wide row gather: [Lm, 16, 256] f32 table, gather 64k rows
    lm, ls = 384, 256
    table = jnp.asarray(rs.rand(lm, 16, ls), jnp.float32)
    idx = jnp.asarray(rs.randint(0, lm, 1 << 16), jnp.int32)

    @jax.jit
    def gath():
        return jnp.sum(table[idx], axis=(1, 2))

    bench("row gather 64k x [16,256] (4GB-ish)", gath)

    # [N, Lm] slab + K=8 iterative index extraction
    n = 1 << 16
    ent = jnp.asarray(rs.rand(n, lm).astype(np.float32))
    mask = ent < 0.05  # ~19 chunks per ray

    @jax.jit
    def extract():
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, lm), 1)
        m = mask
        outs = []
        for _ in range(8):
            ci = jnp.min(jnp.where(m, iota, lm), axis=1)
            outs.append(ci)
            m = m & (iota != ci[:, None])
        return jnp.stack(outs)

    bench("K=8 index extraction [64k, 384]", extract)


if __name__ == "__main__":
    main()
