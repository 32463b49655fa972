"""On-chip equivalence + timing: Pallas dense sweep vs XLA dense path.

Builds the real cornell-box geometry, fires camera-like random rays, and
compares `_intersect_dense_pallas` against `_intersect_dense` (hit masks,
t, prim, barycentrics), then times both at several wavefront sizes.
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
    print("prims (padded):", geom.p0.shape[0], flush=True)

    rs = np.random.RandomState(0)
    n = 1 << 14
    # origins INSIDE the box so most rays hit (box spans ~[0,556]^3)
    o = jnp.asarray(
        np.array([278, 274, 280], np.float32)[None]
        + rs.uniform(-150, 150, (n, 3)).astype(np.float32)
    )
    d = jnp.asarray(
        rs.normal(size=(n, 3)).astype(np.float32)
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    h_x = traversal._intersect_dense(geom, o, d, 1e-3, 1e30, False)
    h_p = traversal._intersect_dense_pallas(geom, o, d, 1e-3, 1e30, False)
    jax.block_until_ready((h_x, h_p))

    v_x, v_p = np.asarray(h_x.valid), np.asarray(h_p.valid)
    print("valid agree:", (v_x == v_p).mean(), flush=True)
    m = v_x & v_p
    for name, a, b, tol in (
        ("t", h_x.t, h_p.t, 1e-3),
        ("v", h_x.v, h_p.v, 1e-3),
        ("w", h_x.w, h_p.w, 1e-3),
    ):
        err = np.abs(np.asarray(a)[m] - np.asarray(b)[m]).max() if m.any() else 0
        print(f"{name} max|diff| on agreeing hits: {err:.2e}", flush=True)
    prim_agree = (np.asarray(h_x.prim)[m] == np.asarray(h_p.prim)[m]).mean()
    ins_agree = (np.asarray(h_x.inside)[m] == np.asarray(h_p.inside)[m]).mean()
    print(f"prim agree: {prim_agree:.4f}  inside agree: {ins_agree:.4f}",
          flush=True)

    # any-hit
    a_x = traversal._intersect_dense(geom, o, d, 1e-3, 1e3, True).valid
    a_p = traversal._intersect_dense_pallas(geom, o, d, 1e-3, 1e3, True).valid
    print("anyhit agree:", (np.asarray(a_x) == np.asarray(a_p)).mean(),
          flush=True)

    # timing sweep
    for log_n in (14, 16, 18, 20):
        nn = 1 << log_n
        reps = max(1, (1 << 18) // nn)
        oo = jnp.tile(o, (max(1, nn // n), 1))[:nn]
        dd = jnp.tile(d, (max(1, nn // n), 1))[:nn]

        fx = jax.jit(
            lambda o_, d_: traversal._intersect_dense(
                geom, o_, d_, 1e-3, 1e30, False
            ).t
        )
        fp = jax.jit(
            lambda o_, d_: traversal._intersect_dense_pallas(
                geom, o_, d_, 1e-3, 1e30, False
            ).t
        )
        for name, f in (("xla", fx), ("pallas", fp)):
            f(oo, dd).block_until_ready()  # compile
            t0 = time.time()
            for _ in range(reps):
                r = f(oo, dd)
            r.block_until_ready()
            dt = (time.time() - t0) / reps
            mrays = nn / dt / 1e6
            print(
                f"n={nn:>8} {name:>6}: {dt*1e3:7.2f} ms  {mrays:8.1f} Mrays/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
