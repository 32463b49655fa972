"""Acceptance-scale golden renders (VERDICT r1 missing #3 / next #4):
matpreview family + dragon at native resolution and high spp, in BOTH
clamp modes, compared against the reference's own PNGs (clamp≈1.0
should match them tightly) and the Tungsten EXR truth (clamp off,
firefly-robust trimmed relMSE).

One scene per subprocess (worker crashes must not poison the batch);
results append to acceptance_results.jsonl and the table goes into
GOLDEN.md by hand.

    python scripts/acceptance_render.py [--spp 256] [--scene NAME] [--scale 1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SCENES = "/root/reference/resources/scene"
RESULTS = "/root/reference/resources/results"
OUT = os.path.join(REPO, "acceptance")

# (name, xml, own png, tungsten exr)
CASES = [
    ("plastic", "matpreview/plastic.xml", "plastic.png", None),
    ("rough-conductor-aniso", "matpreview/rough_conductor.xml",
     "rough-conductor.png", None),
    ("conductor", "matpreview/conductor.xml", "conductor.png", None),
    ("rough-conductor", "matpreview/rough_conductor_isotropic.xml",
     "rough-conductor-isotropic.png", None),
    ("dielectric", "matpreview/dielectric.xml", "dielectric.png", None),
    ("rough-dielectric", "matpreview/rough_dielectric.xml",
     "rough-dielectric.png", None),
    ("thin-dielectric", "matpreview/thin_dielectric.xml",
     "thin-dielectric.png", None),
    ("rough-plastic", "matpreview/rough_plastic.xml",
     "rough-plastic.png", None),
    ("dragon", "dragon/scene.xml", "dragon.png",
     "dragon/TungstenRender.exr"),
    ("cornell-box", "cornell-box/scene_v0.6.xml", "cornell-box.png",
     "cornell-box/TungstenRender.exr"),
    # BASELINE config #5: homogeneous medium + isotropic phase (volpath)
    ("volumetric-caustic", "volumetric-caustic/scene_v0.6.xml",
     "volumetric-caustic_isotropic.png",
     "volumetric-caustic/TungstenRender.exr"),
    # the two mesh-heavy interiors (three-way vs reference + Tungsten)
    ("classroom", "classroom/scene_v0.6.xml", "classroom.png",
     "classroom/TungstenRender.exr"),
    ("dining-room", "dining-room/scene_v0.6.xml", "dining-room.png",
     "dining-room/TungstenRender.exr"),
]

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
xml, clamp, spp, scale, npz = sys.argv[2], float(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]), sys.argv[6]
import numpy as np, jax
from mcpt_tpu.render.renderer import Renderer
from mcpt_tpu.scene.parser import load_config
cfg = load_config(xml)
cfg.camera.width //= scale
cfg.camera.height //= scale
cfg.integrator.sample_clamp = clamp
r = Renderer(cfg)
t0 = time.time()
import os as _os
tile = int(_os.environ.get("MCPT_ACC_TILE", 1 << 16))
img = r.render(spp=spp, tile=tile, spp_chunk=8)
jax.block_until_ready(img)
np.savez_compressed(npz, img=np.asarray(img), wall_s=time.time() - t0,
                    spp=spp, clamp=clamp)
print("SAVED", npz, flush=True)
"""


def metrics(img, name, exr_rel):
    import numpy as np
    import PIL.Image

    h, w = img.shape[:2]
    out = {}
    png = os.path.join(RESULTS, name)
    if os.path.exists(png):
        g = np.asarray(
            PIL.Image.open(png).convert("RGB"), np.float32
        ) / 255.0
        gh, gw = g.shape[:2]
        fy, fx = gh // h, gw // w
        if fy >= 1 and fx >= 1:
            g = g[: h * fy, : w * fx].reshape(h, fy, w, fx, 3).mean((1, 3))
            gl = g ** 2.2
            a = np.clip(img, 0, 1) ** (1 / 2.2)
            b = np.clip(gl, 0, 1) ** (1 / 2.2)
            out["own_display_relmse"] = float(
                np.mean((a - b) ** 2 / (b**2 + 1e-3))
            )
    if exr_rel:
        from mcpt_tpu.utils.image import read_exr

        e = read_exr(os.path.join(SCENES, exr_rel))
        gh, gw = e.shape[:2]
        fy, fx = gh // h, gw // w
        if fy >= 1 and fx >= 1:
            e = e[: h * fy, : w * fx].reshape(h, fy, w, fx, 3).mean((1, 3))
            err = ((img - e) ** 2 / (e**2 + 1e-3)).mean(-1).ravel()
            k = max(1, int(err.size * 0.999))
            out["tungsten_relmse_trim01pct"] = float(np.sort(err)[:k].mean())
            out["tungsten_relmse"] = float(err.mean())
    return out


def run_case(name, rel, own_png, exr, clamp, args, log):
    import numpy as np

    tag = f"{name}_clamp{clamp:g}_spp{args.spp}_s{args.scale}"
    npz = os.path.join(OUT, tag + ".npz")
    if os.path.exists(npz):
        print(f"[skip] {tag} exists", flush=True)
    else:
        try:
            p = subprocess.run(
                [sys.executable, "-c", WORKER, REPO,
                 os.path.join(SCENES, rel), str(clamp),
                 str(args.spp), str(args.scale), npz],
                capture_output=True, timeout=args.timeout, text=True,
            )
        except subprocess.TimeoutExpired:
            rec = {"scene": name, "clamp": clamp, "spp": args.spp,
                   "error": f"timeout {args.timeout}s"}
            print(json.dumps(rec), flush=True)
            with open(log, "a") as f:
                f.write(json.dumps(rec) + "\n")
            return
        if p.returncode != 0:
            rec = {"scene": name, "clamp": clamp, "spp": args.spp,
                   "error": (p.stderr or p.stdout)[-400:].strip()}
            print(json.dumps(rec), flush=True)
            with open(log, "a") as f:
                f.write(json.dumps(rec) + "\n")
            return
    d = np.load(npz)
    rec = {"scene": name, "clamp": clamp, "spp": args.spp,
           "scale": args.scale, "wall_s": round(float(d["wall_s"]), 1)}
    rec.update(metrics(d["img"], own_png, exr))
    print(json.dumps(rec), flush=True)
    with open(log, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--scene", default=None)
    ap.add_argument("--scale", type=int, default=1,
                    help="divide native resolution by this")
    ap.add_argument("--clamps", nargs="+", type=float, default=[0.0, 1.0])
    ap.add_argument("--timeout", type=int, default=3000)
    ap.add_argument("--jobs", type=int, default=1,
                    help="concurrent scene subprocesses: compiles run on "
                    "the remote AOT service (one helper per request) so "
                    "they overlap; executions serialize on the worker")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)

    log = os.path.join(OUT, "acceptance_results.jsonl")
    work = [
        (name, rel, own_png, exr, clamp)
        for name, rel, own_png, exr in CASES
        if not args.scene or args.scene == name
        for clamp in args.clamps
    ]
    if args.jobs <= 1:
        for w in work:
            run_case(*w, args, log)
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=args.jobs) as ex:
        futs = [ex.submit(run_case, *w, args, log) for w in work]
        for f in futs:
            f.result()


if __name__ == "__main__":
    main()
