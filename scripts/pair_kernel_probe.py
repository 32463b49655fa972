"""Kernel B (pair_sweep) cost dissection: all-dead vs live streams, R
sweep.  python scripts/pair_kernel_probe.py"""
import sys, time
sys.path.insert(0, "/root/repo")
import os
import jax, jax.numpy as jnp
import numpy as np


def bench(name, fn, reps=10):
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r)
    print(f"{name:>36}: {(time.time()-t0)/reps*1e3:8.3f} ms", flush=True)


def main():
    from mcpt_tpu.ops.pallas_pairs import pair_sweep

    rs = np.random.RandomState(0)
    lm, ls = 384, 256
    tris = jnp.asarray(rs.rand(lm, 16, ls).astype(np.float32))
    n_pairs = 1 << 19  # 512k

    for r in [512, 768]:
        os.environ["MCPT_PAIR_BLOCK"] = str(r)
        g = n_pairs // r if n_pairs % r == 0 else -(-n_pairs // r)
        pad = g * r

        def mk(frac_live):
            n_live = int(pad * frac_live)
            pc = np.full(pad, lm, np.float32)
            pc[:n_live] = np.sort(rs.randint(0, lm, n_live)).astype(np.float32)
            rows = np.zeros((16, pad), np.float32)
            rows[0:3] = rs.rand(3, pad)
            rows[3:6] = rs.normal(size=(3, pad))
            rows[6] = 1e-4
            rows[7] = np.where(pc < lm, 3.4e38, 0.0)
            rows[8] = pc
            return jnp.asarray(
                rows.reshape(16, g, r).swapaxes(0, 1).copy()
            )

        rays_dead = mk(0.0)
        rays_live40 = mk(0.4)
        f = jax.jit(lambda rp: pair_sweep(rp, tris, any_hit=False)[0],
                    static_argnames=())
        bench(f"R={r} all-dead 512k pairs", lambda: f(rays_dead))
        bench(f"R={r} 40%-live 512k pairs", lambda: f(rays_live40))


if __name__ == "__main__":
    main()
