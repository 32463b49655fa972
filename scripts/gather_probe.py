"""Microbench per-lane dynamic gathers on the real chip.

The envmap NEE path (sample: two binary searches; pdf/eval: 2D gathers +
bilinear atlas reads) is the only stage whose cost scales with gather
latency, and the bench-suite shows every bitmap-envmap scene running
25-250x slower than cornell.  This probe prices the primitives so the
redesign (Vose alias table: 2 gathers/draw) can be justified by data.

K=64 in-jit chained reps amortize the ~25ms axon dispatch floor.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 16
K = 64


def bench(name, fn):
    @jax.jit
    def run():
        def body(acc, _):
            return fn(acc), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return acc

    run().block_until_ready()
    t0 = time.time()
    run().block_until_ready()
    dt = (time.time() - t0) / K * 1e3
    print(f"{name:>44}: {dt:8.3f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    xi = jax.random.uniform(key, (N,))
    from mcpt_tpu.ops.warps import searchsorted_cdf, searchsorted_cdf_rows

    for size in (1 << 12, 1 << 16, 1 << 20, 1 << 23):
        tab = jnp.arange(size, dtype=jnp.float32)
        idx = (xi * (size - 1)).astype(jnp.int32)
        bench(f"1D gather [{size}] f32",
              lambda acc, tab=tab, idx=idx: acc + jnp.sum(tab[(idx + acc.astype(jnp.int32)) % size]))
        tab3 = jnp.stack([tab, tab, tab], -1)
        bench(f"1D row gather [{size},3] f32",
              lambda acc, tab=tab3, idx=idx: acc + jnp.sum(tab[(idx + acc.astype(jnp.int32)) % size]))

    h, w = 2048, 4096
    cdf2d = jnp.asarray(np.random.rand(h, w + 1).astype(np.float32))
    rows = (xi * (h - 1)).astype(jnp.int32)
    cols = (jnp.flip(xi) * (w - 1)).astype(jnp.int32)
    bench(f"2D gather [{h},{w}]",
          lambda acc: acc + jnp.sum(cdf2d[rows, (cols + acc.astype(jnp.int32)) % w]))
    bench(f"2D gather flattened [{h}*{w}]",
          lambda acc: acc + jnp.sum(
              cdf2d.reshape(-1)[(rows * (w + 1) + (cols + acc.astype(jnp.int32)) % w)]))

    cdf_rows = jnp.asarray(np.linspace(0, 1, h + 1).astype(np.float32))
    bench(f"searchsorted_cdf [{h+1}]",
          lambda acc: acc + jnp.sum(searchsorted_cdf(
              cdf_rows, xi * (1 - acc * 1e-20))))
    bench(f"searchsorted_cdf_rows [{h},{w+1}]",
          lambda acc: acc + jnp.sum(searchsorted_cdf_rows(
              cdf2d, rows, xi * (1 - acc * 1e-20))))

    # the alias-draw shape: 2 gathers + a select
    prob = jnp.asarray(np.random.rand(h * w).astype(np.float32))
    alias = jnp.asarray(np.random.randint(0, h * w, h * w, dtype=np.int32))
    j = (xi * (h * w - 1)).astype(jnp.int32)
    def alias_draw(acc):
        jj = (j + acc.astype(jnp.int32)) % (h * w)
        p = prob[jj]
        a = alias[jj]
        out = jnp.where(jnp.flip(xi) < p, jj, a)
        return acc + jnp.sum(out % 7).astype(jnp.float32)
    bench(f"alias draw [{h*w}]", alias_draw)


if __name__ == "__main__":
    main()
