"""On-chip equivalence + timing: Pallas march kernel vs XLA march.

Loads a real large scene (matpreview conductor, ~60k tris -> march
path), fires camera-ish rays, checks the Pallas block-march against the
XLA march, then times both at several wavefront sizes.

    python scripts/pallas_march_bench.py [--scene XML] [--equiv-only]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--scene",
        default="/root/reference/resources/scene/matpreview/conductor.xml",
    )
    ap.add_argument("--equiv-only", action="store_true")
    ap.add_argument("--sizes", nargs="+", type=int,
                    default=[14, 16, 18])
    args = ap.parse_args()

    from mcpt_tpu.ops import traversal
    from mcpt_tpu.scene.parser import load_config
    from mcpt_tpu.scene.compile import compile_scene

    cfg = load_config(args.scene)
    scene = compile_scene(cfg)
    geom = scene.geom
    print(f"prims (padded): {geom.p0.shape[0]}  march chunks: "
          f"{geom.n_march_leaves} x {geom.march_leaf}", flush=True)

    # rays from around the camera toward the scene center
    lo = np.asarray(geom.node_min[0])
    hi = np.asarray(geom.node_max[0])
    ctr = (lo + hi) / 2
    span = float(np.max(hi - lo))
    rs = np.random.RandomState(0)
    n = 1 << 14
    o = jnp.asarray(
        ctr[None] + rs.uniform(-0.6, 0.6, (n, 3)).astype(np.float32) * span
    )
    d = jnp.asarray(rs.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    t0 = time.time()
    h_x = traversal._intersect_march(geom, o, d, 1e-4, 3.4e38, False)
    jax.block_until_ready(h_x)
    print(f"xla march compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    h_p = traversal._intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, False)
    jax.block_until_ready(h_p)
    print(f"pallas march compile+run {time.time()-t0:.1f}s", flush=True)

    v_x, v_p = np.asarray(h_x.valid), np.asarray(h_p.valid)
    print("valid agree:", (v_x == v_p).mean(), " hit rate:", v_x.mean(),
          flush=True)
    m = v_x & v_p
    for name, a, b in (("t", h_x.t, h_p.t), ("v", h_x.v, h_p.v),
                       ("w", h_x.w, h_p.w)):
        err = (np.abs(np.asarray(a)[m] - np.asarray(b)[m]).max()
               if m.any() else 0.0)
        print(f"{name} max|diff| on agreeing hits: {err:.2e}", flush=True)
    prim_agree = (np.asarray(h_x.prim)[m] == np.asarray(h_p.prim)[m]).mean()
    print(f"prim agree: {prim_agree:.4f}", flush=True)

    a_x = traversal._intersect_march(geom, o, d, 1e-4, 3.4e38, True).valid
    a_p = traversal._intersect_march_pallas(
        geom, o, d, 1e-4, 3.4e38, True
    ).valid
    print("anyhit agree:", (np.asarray(a_x) == np.asarray(a_p)).mean(),
          flush=True)
    if args.equiv_only:
        return

    for log_n in args.sizes:
        nn = 1 << log_n
        reps = max(1, (1 << 18) // nn)
        reps_idx = -(-nn // n)
        oo = jnp.tile(o, (reps_idx, 1))[:nn]
        dd = jnp.tile(d, (reps_idx, 1))[:nn]
        fx = jax.jit(lambda o_, d_: traversal._intersect_march(
            geom, o_, d_, 1e-4, 3.4e38, False).t)
        fp = jax.jit(lambda o_, d_: traversal._intersect_march_pallas(
            geom, o_, d_, 1e-4, 3.4e38, False).t)
        for name, f in (("xla", fx), ("pallas", fp)):
            f(oo, dd).block_until_ready()
            t0 = time.time()
            for _ in range(reps):
                r = f(oo, dd)
            r.block_until_ready()
            dt = (time.time() - t0) / reps
            print(f"n={nn:>8} {name:>6}: {dt*1e3:7.2f} ms  "
                  f"{nn/dt/1e6:8.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
