"""BDPT weighting-bias bound on the specular caustic scene (VERDICT r4
next #5): the archive-style pairwise power heuristic is not a partition
of unity over strategies, so it can bias where strategies overlap.
This renders volumetric-caustic/no_medium.xml with the path tracer at
very high spp (the unbiased truth), then BDPT at high spp, and bounds
the bias as the trimmed relative error of BDPT's converged mean —
reported per region (caustic disc vs diffuse walls) since the failure
mode is strategy overlap on diffuse transport, while pure specular
chains are path-only by construction (bdpt.py is_connectible gate).

    python scripts/bdpt_bias.py [--res 256] [--path-spp 16384]
                                [--bdpt-spp 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

XML = "/root/reference/resources/scene/volumetric-caustic/no_medium.xml"


def render(itype, spp, res):
    from mcpt_tpu.render.renderer import Renderer
    from mcpt_tpu.scene.parser import load_config

    cfg = load_config(XML)
    cfg.camera.width = cfg.camera.height = res
    cfg.integrator.itype = itype
    t0 = time.time()
    img = Renderer(cfg).render(spp=spp, tile=1 << 16, spp_chunk=64)
    return np.asarray(img), time.time() - t0


def trimmed_rel(a, b, trim=0.005):
    err = (np.abs(a - b) / (b + 1e-3)).mean(-1).ravel()
    k = max(1, int(err.size * (1 - trim)))
    return float(np.sort(err)[:k].mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--path-spp", type=int, default=16384)
    ap.add_argument("--bdpt-spp", type=int, default=4096)
    args = ap.parse_args()

    truth, wt = render("path", args.path_spp, args.res)
    print(f"path truth @ {args.path_spp} spp: mean {truth.mean():.5f} "
          f"({wt:.0f}s)", flush=True)
    bd, wb = render("bdpt", args.bdpt_spp, args.res)
    print(f"bdpt @ {args.bdpt_spp} spp: mean {bd.mean():.5f} ({wb:.0f}s)",
          flush=True)

    # regions: "bright" = caustic + direct light (top decile of truth
    # luminance), "diffuse" = the rest of the lit image
    lum = truth.mean(-1)
    bright = lum > np.percentile(lum, 90)
    lit = (lum > np.percentile(lum, 20)) & ~bright
    out = {
        "res": args.res, "path_spp": args.path_spp,
        "bdpt_spp": args.bdpt_spp,
        "mean_ratio_all": float(bd.mean() / truth.mean()),
        "mean_ratio_bright": float(
            bd.mean(-1)[bright].mean() / lum[bright].mean()
        ),
        "mean_ratio_diffuse": float(
            bd.mean(-1)[lit].mean() / lum[lit].mean()
        ),
        "trimmed_rel_all": trimmed_rel(bd, truth),
        "trimmed_rel_diffuse": trimmed_rel(
            bd.mean(-1)[lit, None], lum[lit, None]
        ),
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "acceptance",
            "bdpt_bias.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
