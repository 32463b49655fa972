"""Scaling benchmark: rays/s vs device count on a mesh
(BASELINE.md acceptance: >=80% linear scaling 1 -> N).

On real hardware this measures chips; without a pod it exercises the
identical `shard_map` program on a virtual CPU mesh
(--xla_force_host_platform_device_count), which validates the sharding
and collective layout (the per-device compute is the same program).

    python scripts/scaling_bench.py [--res 128] [--spp 4] [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    import jax

    from bench import fallback_scene, SCENE
    from mcpt_tpu.parallel.shard import make_mesh, render_film_sharded
    from mcpt_tpu.render.camera import make_camera
    from mcpt_tpu.render.renderer import _freeze
    from mcpt_tpu.scene.compile import compile_scene

    n_avail = len(jax.devices())
    counts = [c for c in args.devices if c <= n_avail]
    if jax.devices()[0].platform == "cpu" and n_avail > 1:
        print(
            "[scaling] NOTE: virtual CPU devices share the same physical "
            "cores — this validates the sharded program, the efficiency "
            "numbers are only meaningful on real chips.",
            flush=True,
        )

    if os.path.exists(SCENE):
        from mcpt_tpu.scene.parser import load_config

        config = load_config(SCENE)
    else:
        config = fallback_scene()
    config.camera.width = config.camera.height = args.res
    config.integrator.depth_max = 8
    scene = compile_scene(config)
    camera = make_camera(config.camera)
    integ = _freeze(config.integrator)

    results = []
    base_rate = None
    for c in counts:
        mesh = make_mesh(jax.devices()[:c])
        # compile + warm
        film = render_film_sharded(scene, camera, integ, mesh, spp=1)
        jax.block_until_ready(film)
        t0 = time.time()
        film = render_film_sharded(scene, camera, integ, mesh, spp=args.spp)
        jax.block_until_ready(film)
        dt = time.time() - t0
        rate = args.res * args.res * args.spp / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * c)
        results.append(
            {
                "devices": c,
                "samples_per_s": round(rate),
                "speedup": round(rate / base_rate, 3),
                "efficiency": round(eff, 3),
                "wall_s": round(dt, 3),
            }
        )
        print(f"[scaling] {c} devices: {rate:,.0f} samples/s "
              f"(speedup {rate / base_rate:.2f}x, eff {eff:.0%})", flush=True)

    print(json.dumps({"metric": "scaling", "results": results}))


if __name__ == "__main__":
    main()
