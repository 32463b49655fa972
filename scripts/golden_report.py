"""Golden-image comparison harness.

Renders the reference's benchmark scenes at reduced resolution/spp and
reports relative MSE against BOTH the reference renderer's own committed
results (resources/results/*.png) and the Tungsten ground-truth renders
(TungstenRender.png) where available.

    python scripts/golden_report.py [--res 128] [--spp 16] [--scene NAME]

MC noise note: at low spp the relMSE floor is noise-dominated; the
numbers are for trend tracking, not strict acceptance.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENES = "/root/reference/resources/scene"
RESULTS = "/root/reference/resources/results"

# (name, scene xml, reference-own result png, tungsten png, tungsten exr)
CASES = [
    ("cornell-box", "cornell-box/scene_v0.6.xml",
     "cornell-box.png", "cornell-box/TungstenRender.png",
     "cornell-box/TungstenRender.exr"),
    ("rough-conductor", "matpreview/rough_conductor_isotropic.xml",
     "rough-conductor-isotropic.png", None, None),
    ("conductor", "matpreview/conductor.xml", "conductor.png", None, None),
    ("dielectric", "matpreview/dielectric.xml", "dielectric.png", None, None),
    ("rough-dielectric", "matpreview/rough_dielectric.xml",
     "rough-dielectric.png", None, None),
    ("thin-dielectric", "matpreview/thin_dielectric.xml",
     "thin-dielectric.png", None, None),
    ("rough-plastic", "matpreview/rough_plastic.xml", "rough-plastic.png",
     None, None),
    ("material-testball", "material-testball/scene_v0.6.xml",
     "material-testball.png", None, "material-testball/TungstenRender.exr"),
    ("dragon", "dragon/scene.xml", "dragon.png", "dragon/TungstenRender.png",
     "dragon/TungstenRender.exr"),
    ("mercury-rough-diffuse", "mercury/rough_diffuse.xml",
     "mercury_rough-diffuse.png", None, None),
    ("volumetric-caustic", "volumetric-caustic/scene_v0.6.xml",
     "volumetric-caustic_isotropic.png",
     "volumetric-caustic/TungstenRender.png",
     "volumetric-caustic/TungstenRender.exr"),
    ("box", "box/scene_v0.6.xml", "box.png", None, None),
    # the last never-compared committed renders (VERDICT r4 missing #3)
    ("plastic", "matpreview/plastic.xml", "plastic.png", None, None),
    ("mercury-smooth-diffuse", "mercury/smooth_diffuse.xml",
     "mercury_smooth-diffuse.png", None, None),
    ("no-medium", "volumetric-caustic/no_medium.xml", "no_medium.png",
     None, None),
    ("lte-orb-silver", "lte-orb/silver.xml", "lte-orb_silver.png",
     None, None),
    ("lte-orb-rough-glass", "lte-orb/rough_glass.xml",
     "lte-orb_rough-glass.png", None, None),
    ("classroom", "classroom/scene_v0.6.xml", "classroom.png",
     "classroom/TungstenRender.png", "classroom/TungstenRender.exr"),
    ("dining-room", "dining-room/scene_v0.6.xml", "dining-room.png",
     "dining-room/TungstenRender.png", "dining-room/TungstenRender.exr"),
]


def downsample(img, h, w):
    import numpy as np

    gh, gw = img.shape[:2]
    fy, fx = gh // h, gw // w
    return img[: h * fy, : w * fx].reshape(h, fy, w, fx, 3).mean((1, 3))


def rel_mse(a, b):
    import numpy as np

    return float(np.mean((a - b) ** 2 / (b**2 + 1e-3)))


def rel_mse_trimmed(a, b, trim=0.001):
    """relMSE with the worst `trim` fraction of pixels discarded — an
    unbiased-estimator render at low spp carries a few firefly spikes
    whose squared error over near-black golden pixels otherwise
    dominates the mean."""
    import numpy as np

    err = ((a - b) ** 2 / (b**2 + 1e-3)).mean(-1).ravel()
    k = max(1, int(err.size * (1.0 - trim)))
    return float(np.sort(err)[:k].mean())


def rel_mse_display(a, b):
    """PNG goldens are clipped tonemapped LDR — compare in display space
    (clip to [0,1] then gamma) so HDR highlights don't dominate."""
    import numpy as np

    ea = np.clip(a, 0.0, 1.0) ** (1.0 / 2.2)
    eb = np.clip(b, 0.0, 1.0) ** (1.0 / 2.2)
    return float(np.mean((ea - eb) ** 2 / (eb**2 + 1e-3)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128, help="height in pixels")
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--scene", default=None, help="only run this case")
    ap.add_argument("--out", default="/tmp/golden", help="output dir for renders")
    ap.add_argument("--tile", type=int, default=1 << 14)
    ap.add_argument("--spp-chunk", type=int, default=4)
    ap.add_argument(
        "--isolate",
        action="store_true",
        help="run each scene in its own subprocess — a TPU worker crash "
        "(long-execution watchdog) then only loses that scene",
    )
    args = ap.parse_args()

    if args.isolate:
        import subprocess

        for name, *_ in CASES:
            if args.scene and args.scene != name:
                continue
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--scene", name, "--res", str(args.res),
                "--spp", str(args.spp), "--out", args.out,
                "--tile", str(args.tile), "--spp-chunk", str(args.spp_chunk),
            ]
            try:
                subprocess.run(cmd, timeout=1200, check=False)
            except subprocess.TimeoutExpired:
                print(f"[golden] {name}: TIMEOUT", flush=True)
        return

    import numpy as np

    from mcpt_tpu.render.renderer import Renderer
    from mcpt_tpu.scene.parser import load_config
    from mcpt_tpu.utils.image import read_exr, read_png_linear, write_png

    os.makedirs(args.out, exist_ok=True)
    rows = []
    for name, xml, own_png, tungsten_png, tungsten_exr in CASES:
        if args.scene and args.scene != name:
            continue
        path = os.path.join(SCENES, xml)
        if not os.path.exists(path):
            rows.append((name, "missing-scene", None, None, None, 0.0))
            continue
        try:
            cfg = load_config(path)
            aspect = cfg.camera.width / cfg.camera.height
            h = args.res
            w = int(round(h * aspect))
            cfg.camera.height, cfg.camera.width = h, w
            cfg.integrator.depth_max = min(cfg.integrator.depth_max, 8)
            t0 = time.time()
            r = Renderer(cfg)
            img = np.asarray(
                r.render(
                    spp=args.spp,
                    tile=min(w * h, args.tile),
                    spp_chunk=args.spp_chunk,
                )
            )
            dt = time.time() - t0
            write_png(os.path.join(args.out, f"{name}.png"), img)

            own = t_err = exr_err = None
            own_path = os.path.join(RESULTS, own_png) if own_png else None
            if own_path and os.path.exists(own_path):
                g = downsample(read_png_linear(own_path), h, w)
                own = rel_mse_display(img, g)
            if tungsten_png:
                tp = os.path.join(SCENES, tungsten_png)
                if os.path.exists(tp):
                    g = downsample(read_png_linear(tp), h, w)
                    t_err = rel_mse_display(img, g)
            if tungsten_exr:
                tp = os.path.join(SCENES, tungsten_exr)
                if os.path.exists(tp):
                    # linear-HDR ground truth: the real acceptance number
                    g = downsample(read_exr(tp), h, w)
                    exr_err = (rel_mse(img, g), rel_mse_trimmed(img, g))
            rows.append((name, "ok", own, t_err, exr_err, dt))
            print(
                f"[golden] {name}: own={own} tungsten(png)={t_err} "
                f"tungsten(exr)={exr_err} ({dt:.1f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report and continue
            rows.append((name, f"error: {e}", None, None, None, 0.0))
            print(f"[golden] {name}: ERROR {e}", flush=True)

    print("\n| scene | status | relMSE vs reference | vs Tungsten png "
          "| vs Tungsten exr | s |")
    print("|---|---|---|---|---|---|")
    for name, status, own, t_err, exr_err, dt in rows:
        o = f"{own:.3f}" if own is not None else "-"
        t = f"{t_err:.3f}" if t_err is not None else "-"
        x = (
            f"{exr_err[0]:.3f} / trimmed {exr_err[1]:.3f}"
            if exr_err is not None
            else "-"
        )
        print(f"| {name} | {status} | {o} | {t} | {x} | {dt:.0f} |")


if __name__ == "__main__":
    main()
