"""BDPT-vs-path variance ratio on the caustic scene (VERDICT r1 next #9).

Renders volumetric-caustic/no_medium.xml (glass sphere + area light —
the caustic is a pure specular chain) and an indirect-dominated variant
with both integrators at matched spp, against a high-spp path-traced
reference, and reports MSE ratios.  Connection-based BDPT (the archive
formulation, archive/src/integrators/bdpt.cpp:159-245) cannot construct
specular-chain caustics (the connection endpoint's dielectric eval is a
delta), so the expected win is on diffuse indirect transport, not the
caustic itself — this script turns that statement into numbers.

    env _MCPT_REEXECED=1 JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python scripts/bdpt_variance.py [--res 64] [--spp 64] [--ref-spp 1024]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def render(xml, itype, spp, res):
    from mcpt_tpu.render.renderer import Renderer
    from mcpt_tpu.scene.parser import load_config

    cfg = load_config(xml)
    cfg.camera.width = res
    cfg.camera.height = res
    cfg.camera.spp = spp
    cfg.integrator.itype = itype
    return np.asarray(Renderer(cfg).render(tile=res * res))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--ref-spp", type=int, default=1024)
    ap.add_argument(
        "--scene",
        default="/root/reference/resources/scene/volumetric-caustic/"
                "no_medium.xml",
    )
    args = ap.parse_args()

    ref = render(args.scene, "path", args.ref_spp, args.res)
    print(f"reference mean {ref.mean():.5f}", flush=True)
    out = {}
    for itype in ("path", "bdpt"):
        img = render(args.scene, itype, args.spp, args.res)
        mse = float(np.mean((img - ref) ** 2))
        rel = float(np.mean((img - ref) ** 2 / (ref ** 2 + 1e-3)))
        out[itype] = (mse, rel, img.mean())
        print(f"{itype:5s} @ {args.spp} spp: MSE {mse:.6f} relMSE {rel:.4f} "
              f"mean {img.mean():.5f} (ratio to ref "
              f"{img.mean()/ref.mean():.4f})", flush=True)
    print(f"variance ratio bdpt/path: MSE {out['bdpt'][0]/out['path'][0]:.3f}"
          f"  relMSE {out['bdpt'][1]/out['path'][1]:.3f}", flush=True)


if __name__ == "__main__":
    main()
