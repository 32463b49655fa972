"""Per-scene TPU throughput for every BASELINE.md benchmark config
(VERDICT r1 weak #2: "bench.py measures one scene").

Each scene runs in its OWN subprocess (a TPU worker crash poisons the
in-process jax client — round-1 memory) and reports Mrays/s with the
same ray-counting convention as bench.py (primary + per-bounce
continuation + shadow; stated next to any cross-renderer comparison).

    python scripts/bench_suite.py [--res 512] [--spp 16] [--scene NAME]
Prints one JSON line per scene plus a markdown table at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENES = "/root/reference/resources/scene"

# (name, xml, depth, avg_bounces, itype note) — avg path length for the
# rays metric: closed scenes with RR(0.95@5) ~5.5; open scenes (envmap
# escape) ~2.5; media scenes count null-collision segments ~4
CONFIGS = [
    # the canonical reference workload: 1024x1024, maxDepth 65
    # (scene_v0.6.xml:5,14-18); spp kept at --spp so one run stays short.
    # avg path length with RR(0.95@5): survival sum ~= 5 + 0.95/(1-0.95)
    # capped by escape/absorption in a closed box ~ 13
    ("cornell-canonical", "cornell-box/scene_v0.6.xml", 65, 13.0, 1024),
    ("cornell-box", "cornell-box/scene_v0.6.xml", 8, 5.5),
    ("dragon", "dragon/scene.xml", 8, 2.5),
    ("conductor", "matpreview/conductor.xml", 8, 2.5),
    ("rough-conductor", "matpreview/rough_conductor_isotropic.xml", 8, 2.5),
    ("dielectric", "matpreview/dielectric.xml", 8, 3.5),
    ("thin-dielectric", "matpreview/thin_dielectric.xml", 8, 3.5),
    ("rough-plastic", "matpreview/rough_plastic.xml", 8, 2.5),
    ("mercury-rough-diffuse", "mercury/rough_diffuse.xml", 8, 2.5),
    ("volumetric-caustic", "volumetric-caustic/scene_v0.6.xml", 16, 4.0),
    # BASELINE config #5's HG arm (g = -0.5 as committed)
    ("volumetric-hg", "volumetric-caustic/scene_v0.6_hg.xml", 16, 4.0),
    ("classroom", "classroom/scene_v0.6.xml", 8, 3.5),
    ("dining-room", "dining-room/scene_v0.6.xml", 8, 3.5),
    # archive-BDPT throughput on its headline scene (rays metric counts
    # the camera subpath like the others; light-subpath work is extra,
    # so this understates BDPT — stated for the table)
    ("bdpt-caustic", "volumetric-caustic/no_medium.xml", 8, 3.5, None,
     "bdpt"),
]

WORKER = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
xml, res, spp, depth, avg_b = sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]), float(sys.argv[6])
itype = sys.argv[7] if len(sys.argv) > 7 else ""
import jax
from mcpt_tpu.render.renderer import Renderer
from mcpt_tpu.scene.parser import load_config
cfg = load_config(xml)
cfg.camera.width = cfg.camera.height = res
cfg.integrator.depth_max = depth
if itype:
    cfg.integrator.itype = itype
r = Renderer(cfg)
import os as _os
tile = int(_os.environ.get("MCPT_BENCH_TILE", 1 << 16))
t0 = time.time()
r.render(spp=spp, tile=tile, spp_chunk=8)           # compile + warm
compile_s = time.time() - t0
t0 = time.time()
img = r.render(spp=spp, tile=tile, spp_chunk=8, frame_base=1)
jax.block_until_ready(img)
dt = time.time() - t0
samples = res * res * spp
rays = samples * (1 + 2 * avg_b)
print("RESULT " + json.dumps({
    "mrays_s": round(rays / dt / 1e6, 3),
    "msamples_s": round(samples / dt / 1e6, 3),
    "wall_s": round(dt, 3), "compile_s": round(compile_s, 1),
}), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--scene", default=None)
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args()

    rows = []
    for cfg_row in CONFIGS:
        name, rel, depth, avg_b = cfg_row[:4]
        res = (cfg_row[4] if len(cfg_row) > 4 and cfg_row[4] else args.res)
        itype = cfg_row[5] if len(cfg_row) > 5 else ""
        if args.scene and args.scene != name:
            continue
        xml = os.path.join(SCENES, rel)
        try:
            out = subprocess.run(
                [sys.executable, "-c", WORKER, REPO, xml, str(res),
                 str(args.spp), str(depth), str(avg_b), itype],
                capture_output=True, timeout=args.timeout, text=True,
            )
            line = next(
                (ln for ln in out.stdout.splitlines()
                 if ln.startswith("RESULT ")), None,
            )
            if out.returncode != 0 or line is None:
                rows.append({"scene": name, "error":
                             (out.stderr or out.stdout)[-300:].strip()})
            else:
                r = json.loads(line[7:])
                r["scene"] = name
                rows.append(r)
        except subprocess.TimeoutExpired:
            rows.append({"scene": name,
                         "error": f"timeout {args.timeout}s (compile hang)"})
        print(json.dumps(rows[-1]), flush=True)

    print(f"\n| scene | Mrays/s | Msamples/s | wall s | compile s |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['scene']} | — | — | — | {r['error'][:60]} |")
        else:
            print(f"| {r['scene']} | {r['mrays_s']} | {r['msamples_s']} "
                  f"| {r['wall_s']} | {r['compile_s']} |")


if __name__ == "__main__":
    main()
