"""Henyey-Greenstein scene-level A/B (BASELINE config #5, VERDICT r4
missing #2): render volumetric-caustic/scene_v0.6_hg.xml at g = -0.5
(as committed) and g = +0.5 (the reference's flipped arm) and compare
each against its committed render resources/results/
volumetric-caustic_hg<sign>0.5.png in display space.

    python scripts/hg_ab.py [--spp 256] [--res 512] [--clamp 1.0]
Appends rows to acceptance/acceptance_results.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

XML = "/root/reference/resources/scene/volumetric-caustic/scene_v0.6_hg.xml"
RESULTS = "/root/reference/resources/results"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--clamp", type=float, default=1.0)
    args = ap.parse_args()

    import numpy as np

    from mcpt_tpu.render.renderer import Renderer
    from mcpt_tpu.scene.parser import load_config
    from mcpt_tpu.utils.image import read_png_linear
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from golden_report import downsample, rel_mse_display

    rows = []
    for g in (-0.5, +0.5):
        cfg = load_config(XML)
        cfg.camera.width = cfg.camera.height = args.res
        cfg.integrator.sample_clamp = args.clamp
        for m in cfg.media:
            assert m.phase == "hg"
            m.g = np.full(3, g, np.float32)
        t0 = time.time()
        img = Renderer(cfg).render(spp=args.spp, tile=1 << 14, spp_chunk=8)
        wall = time.time() - t0

        tag = f"hg{g:+.1f}".replace("+", "")  # hg-0.5 / hg0.5
        gold = read_png_linear(
            os.path.join(RESULTS, f"volumetric-caustic_{tag}.png")
        )  # [H, W, 3] linear-light
        h = min(img.shape[0], gold.shape[0])
        w = min(img.shape[1], gold.shape[1])
        ours = downsample(img, h, w) if img.shape[:2] != (h, w) else img
        gold = downsample(gold, h, w) if gold.shape[:2] != (h, w) else gold
        rm = rel_mse_display(ours, gold)
        row = {
            "scene": f"volumetric-caustic_{tag}", "clamp": args.clamp,
            "spp": args.spp, "res": args.res, "wall_s": round(wall, 1),
            "own_display_relmse": rm,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        np.savez_compressed(
            os.path.join(REPO, "acceptance",
                         f"{row['scene']}_clamp{int(args.clamp)}"
                         f"_spp{args.spp}.npz"),
            film=img.astype(np.float32),
        )

    with open(os.path.join(REPO, "acceptance", "acceptance_results.jsonl"),
              "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
