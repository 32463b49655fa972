"""Controlled same-machine quality A/B: the reference CPU binary vs the
TPU build at MATCHED scene, resolution, and spp (r3 VERDICT weak #3 —
matpreview parity previously rested on a fitted display scalar because
no reference render could be produced locally).

The reference clamps every sample's radiance to 1.0 before averaging
(renderer.cpp:77-79), so the comparison uses the TPU build's clamp=1
acceptance artifacts (acceptance/*_clamp1_spp256_s8.npz).  Its PNG
output is sRGB (image_io.cpp:25-53); both sides compare in display
space (x^(1/2.2) of linear, like scripts/acceptance_render.py metrics).

Reading the table: matpreview mean ratios cluster at 1.27-1.33 — the
reference's envmap energy loss, proven analytically by the furnace
gate (tests/test_emitter.py TestEnvmapFurnace, GOLDEN.md r4 update).
The dielectric row's large relMSE is the reference's own black-pixel
speckle inside the glass (depth-killed total-internal-reflection
chains render (0,0,0) where this framework renders ~0.67; the relMSE
denominator's +1e-3 amplifies exactly those pixels ~450x).  Sunsky
scenes are excluded: the local binary overexposes them (BASELINE.md
caveat).

    python refbench/quality_ab.py [--spp 256]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np
import PIL.Image

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SCENES = "/root/reference/resources/scene"

# (acceptance tag, xml, native w, native h, scale)
CASES = [
    ("conductor", "matpreview/conductor.xml", 1366, 1024, 8),
    ("rough-conductor", "matpreview/rough_conductor_isotropic.xml",
     1366, 1024, 8),
    ("dielectric", "matpreview/dielectric.xml", 1366, 1024, 8),
    ("thin-dielectric", "matpreview/thin_dielectric.xml", 1366, 1024, 8),
    ("rough-plastic", "matpreview/rough_plastic.xml", 1366, 1024, 8),
    ("rough-dielectric", "matpreview/rough_dielectric.xml", 1366, 1024, 8),
    ("dragon", "dragon/scene.xml", 1280, 720, 8),
    ("cornell-box", "cornell-box/scene_v0.6.xml", 1024, 1024, 2),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--out", default=os.path.join(HERE, "quality_ab.json"))
    args = ap.parse_args()

    binary = os.path.join(HERE, "build", "csrt")
    rows = []
    for tag, xml, w, h, scale in CASES:
        npz = os.path.join(
            REPO, "acceptance", f"{tag}_clamp1_spp{args.spp}_s{scale}.npz"
        )
        if not os.path.exists(npz):
            rows.append({"scene": tag, "error": f"no TPU artifact {npz}"})
            print(json.dumps(rows[-1]), flush=True)
            continue
        ours = np.load(npz)["img"]  # linear float
        rw, rh = w // scale, h // scale
        png = f"/tmp/ref_ab_{tag}.png"
        if not os.path.exists(png):
            p = subprocess.run(
                [binary, "-c", "-i", os.path.join(SCENES, xml), "-o", png,
                 "-w", str(rw), "-h", str(rh), "-s", str(args.spp)],
                capture_output=True, text=True, timeout=7200,
            )
            if p.returncode != 0:
                rows.append({"scene": tag,
                             "error": (p.stderr or p.stdout)[-200:]})
                print(json.dumps(rows[-1]), flush=True)
                continue
        ref = np.asarray(
            PIL.Image.open(png).convert("RGB"), np.float32
        ) / 255.0  # sRGB-encoded
        oh, ow = ours.shape[:2]
        ref = ref[:oh, :ow]
        a = np.clip(ours, 0.0, 1.0) ** (1 / 2.2)  # our linear -> display
        b = ref  # reference already display-encoded
        relmse = float(np.mean((a - b) ** 2 / (b**2 + 1e-3)))
        err = ((a - b) ** 2 / (b**2 + 1e-3)).mean(-1).ravel()
        k = max(1, int(err.size * 0.999))
        rows.append({
            "scene": tag, "spp": args.spp, "res": f"{ow}x{oh}",
            "display_relmse": round(relmse, 5),
            "display_relmse_trim01pct": round(
                float(np.sort(err)[:k].mean()), 5),
            "mean_ratio_ours_over_ref": round(
                float(a.mean() / max(b.mean(), 1e-9)), 4),
        })
        print(json.dumps(rows[-1]), flush=True)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print("\n| scene | display relMSE | trimmed | mean ratio |")
    print("|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['scene']} | — | — | {r['error'][:50]} |")
        else:
            print(f"| {r['scene']} | {r['display_relmse']} "
                  f"| {r['display_relmse_trim01pct']} "
                  f"| {r['mean_ratio_ours_over_ref']} |")


if __name__ == "__main__":
    main()
