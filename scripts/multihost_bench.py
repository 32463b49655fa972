"""1 -> N PROCESS scaling curve through the jax.distributed path
(BASELINE.md: >=80% linear rays/s 1 host -> N hosts).

Without a pod this spawns N local CPU processes x M virtual devices
each — the collective/sharding program is identical to a real multi-host
job, so this validates the layout; efficiency numbers only become
meaningful on real chips (local processes share cores).

    python scripts/multihost_bench.py [--procs 1 2] [--res 64] [--spp 4]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time
port, pid, nproc, res, spp = sys.argv[1:6]
import jax
if int(nproc) > 1:
    jax.distributed.initialize(f"localhost:{port}", int(nproc), int(pid))
sys.path.insert(0, os.environ["MCPT_REPO"])
from mcpt_tpu.parallel.distributed import render_film_multihost
from mcpt_tpu.render.camera import make_camera
from mcpt_tpu.render.renderer import _freeze
from mcpt_tpu.scene.compile import compile_scene
from mcpt_tpu.scene.parser import load_config
from bench import fallback_scene, SCENE

if os.path.exists(SCENE):
    cfg = load_config(SCENE)
else:
    cfg = fallback_scene()
cfg.camera.width = cfg.camera.height = int(res)
cfg.integrator.depth_max = 8
scene = compile_scene(cfg)
camera = make_camera(cfg.camera)
integ = _freeze(cfg.integrator)

render_film_multihost(scene, camera, integ, spp=1)   # compile + warm
t0 = time.time()
render_film_multihost(scene, camera, integ, spp=int(spp))
dt = time.time() - t0
if int(pid) == 0:
    print(f"WALL {dt:.4f}", flush=True)
if int(nproc) > 1:
    jax.distributed.shutdown()
"""


def free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_job(nproc: int, dev_per_proc: int, res: int, spp: int) -> float:
    port = free_port()
    env = dict(os.environ)
    env.update(
        _MCPT_REEXECED="1",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO,
        MCPT_REPO=REPO,
        XLA_FLAGS=f"--xla_force_host_platform_device_count={dev_per_proc}",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(port), str(pid),
             str(nproc), str(res), str(spp)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(o[-3000:])
    for line in outs[0].splitlines():
        if line.startswith("WALL "):
            return float(line.split()[1])
    raise RuntimeError("no WALL line:\n" + outs[0][-2000:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--dev-per-proc", type=int, default=2)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--spp", type=int, default=4)
    args = ap.parse_args()

    results, base = [], None
    for n in args.procs:
        dt = run_job(n, args.dev_per_proc, args.res, args.spp)
        rate = args.res * args.res * args.spp / dt
        if base is None:
            base = rate
        eff = rate / (base * n)
        results.append({"processes": n, "samples_per_s": round(rate),
                        "speedup": round(rate / base, 3),
                        "efficiency": round(eff, 3), "wall_s": round(dt, 3)})
        print(f"[multihost] {n} proc x {args.dev_per_proc} dev: "
              f"{rate:,.0f} samples/s (eff {eff:.0%})", flush=True)
    print(json.dumps({"metric": "multihost_scaling", "results": results}))


if __name__ == "__main__":
    main()
