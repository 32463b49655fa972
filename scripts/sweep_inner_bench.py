"""Pure device-side throughput of the dense sweep: chains K sweeps
inside ONE jitted scan (data dependency via t accumulation), so axon
dispatch latency is amortized away.  This is the number the in-render
trace stage actually sees.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mcpt_tpu.ops import traversal
    from mcpt_tpu.scene.parser import load_config
    from mcpt_tpu.scene.compile import compile_scene

    cfg = load_config(
        "/root/reference/resources/scene/cornell-box/scene_v0.6.xml"
    )
    scene = compile_scene(cfg)
    geom = scene.geom
    p = geom.p0.shape[0]

    rs = np.random.RandomState(0)
    K = 32

    for log_n in (14, 16, 18, 20):
        n = 1 << log_n
        o = jnp.asarray(rs.uniform(-0.9, 0.9, (n, 3)).astype(np.float32))
        o = o * jnp.array([1.0, 0.0, 1.0]) + jnp.array([0.0, 1.0, 0.0])
        d = jnp.asarray(rs.normal(size=(n, 3)).astype(np.float32))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        def chained(fn):
            @jax.jit
            def run(o_, d_):
                def body(acc, i):
                    h = fn(geom, o_ + acc * 1e-9, d_, 1e-3, 1e30, False)
                    return acc + jnp.sum(h.t % 1.0), None

                acc, _ = jax.lax.scan(body, 0.0, jnp.arange(K))
                return acc

            return run

        for name, fn in (
            ("xla", traversal._intersect_dense),
            ("pallas", traversal._intersect_dense_pallas),
        ):
            run = chained(fn)
            run(o, d).block_until_ready()
            t0 = time.time()
            r = run(o, d)
            r.block_until_ready()
            dt = (time.time() - t0) / K
            print(
                f"n={n:>8} {name:>6}: {dt*1e3:8.3f} ms/sweep "
                f"{n/dt/1e6:9.1f} Mrays/s  "
                f"{n*p*33/dt/1e12:6.3f} Tflop/s-equiv",
                flush=True,
            )


if __name__ == "__main__":
    main()
