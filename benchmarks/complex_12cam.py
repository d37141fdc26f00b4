"""Config 5 with the REAL 12-camera rig: the `Camera Calibrations/` set.

The reference ships eleven genuine Tsai calibrations of its multi-camera
rig (`/root/reference/Camera Calibrations/cal-*.{cal,xml}`) plus the
complexScene's own `ipod.cal` — twelve real cameras that all view the
complexScene mesh (measured coverage 0.46–0.96 of face centroids) — but no
photographs taken *from* them. So this run is the `expfit.c`-style
round-trip at full config-5 scale on real geometry and real calibrations:

1. synthesize 12 views of `ipod.obj` from the 12 real cameras under the
   measured LED rig, with known per-face Cook-Torrance parameters;
2. fit per-pixel texels of a reference view through the multi-camera
   reprojection sampler (`build_pixel_problem`: per-view z-buffers,
   bilinear sampling, cross-view visibility weights);
3. relight the scene under a novel light with the fitted parameters and
   compare against the ground-truth relight.

Artifacts land in ``runs/complex_12cam/``: events.jsonl, metrics.json,
relit_fit.png / relit_truth.png / residual.png, view0_input.png.

    python benchmarks/complex_12cam.py [--stride 4] [--out runs/complex_12cam]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAL_DIR = "/root/reference/Camera Calibrations"
SCENE_DIR = "/root/reference/img/complexScene"

RIG_CALS = [
    "cal-links-oben-nach-unten.cal", "cal-links-weit.cal", "cal-links.xml",
    "cal-mitte-weit.cal", "cal-mitte.cal", "cal-oben-nach-unten.cal",
    "cal-oben.cal", "cal-rechts-oben-nach-unten.cal", "cal-rechts-weit.cal",
    "cal-rechts.cal", "cal-unten.cal",
]  # + the scene's own ipod.cal = 12 real cameras ("test.cal" barely sees
   # the object — coverage 0.085 — and is excluded like the rig excludes it)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--model", default="cook_torrance")
    ap.add_argument("--out", default="runs/complex_12cam")
    ap.add_argument("--platform", default="cpu",
                    help="cpu by default: this is a correctness/coverage "
                         "artifact, not a throughput bench")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    import jax.numpy as jnp
    from PIL import Image

    from brdf_tpu.geometry import Camera, TriangleMesh
    from brdf_tpu.io import load_cal, led_rig_positions
    from brdf_tpu.pipeline import (
        Scene, build_pixel_problem, fit_per_texel, render_image, relight,
    )
    from brdf_tpu.utils.logging import EventLog

    os.makedirs(args.out, exist_ok=True)
    log = EventLog(os.path.join(args.out, "events.jsonl"))

    def save_png(img, name):
        Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(args.out, name))

    t0 = time.time()
    mesh = TriangleMesh.from_obj(os.path.join(SCENE_DIR, "ipod.obj"))
    cals = [load_cal(os.path.join(SCENE_DIR, "ipod.cal"))] + [
        load_cal(os.path.join(CAL_DIR, f)) for f in RIG_CALS
    ]
    cams = [Camera.from_calibration(c, 800, 600) for c in cals]
    lights = led_rig_positions()[:12]
    scene = Scene(
        mesh=mesh, cameras=cams, lights=lights,
        images=np.zeros((12, 600, 800, 3), np.float32), name="complex_12cam",
    )
    log("scene_loaded", name=scene.name, views=12, faces=mesh.num_faces,
        cameras="12 real Tsai calibrations", secs=round(time.time() - t0, 2))

    # Ground-truth per-face params (per channel), spatially SMOOTH: iid
    # per-face parameters make bilinear cross-view samples blend unrelated
    # materials at every face boundary (a large artificial noise floor that
    # pushes grazing texels' roughness to its bound and blows up the novel-
    # light speculars); low-frequency material fields are also what real
    # objects look like.
    rng = np.random.default_rng(0)
    t_faces = mesh.num_faces
    cen = np.asarray(mesh.centroids, np.float64)
    cen = (cen - cen.min(0)) / (cen.max(0) - cen.min(0))   # → [0,1]^3

    def field(lo, hi, phase):
        w = rng.normal(size=3)
        v = 0.5 + 0.5 * np.sin(2.0 * np.pi * (cen @ w) + phase)  # (F,)
        return lo + (hi - lo) * v

    true_params = np.stack(
        [
            np.stack([field(0.2, 0.8, rng.uniform(0, 6)) for _ in range(3)], -1),
            np.stack([field(0.15, 0.7, rng.uniform(0, 6)) for _ in range(3)], -1),
            np.stack([field(0.25, 0.8, rng.uniform(0, 6)) for _ in range(3)], -1),
        ],
        axis=-1,
    ).astype(np.float32)

    t1 = time.time()
    all_faces = np.arange(t_faces)
    imgs = [
        render_image(args.model, scene, true_params, all_faces, view=vi,
                     use_vertex_normals=False)
        for vi in range(12)
    ]
    scene.images = np.stack(imgs).astype(np.float32)
    save_png(scene.images[0], "view0_input.png")
    log("views_rendered", views=12, secs=round(time.time() - t1, 2))

    t2 = time.time()
    prob = build_pixel_problem(
        scene, reference_view=0, stride=args.stride, smooth_normals=False
    )
    w = np.asarray(prob.weights)
    log("problem_built", texels=len(prob.face_ids), granularity="pixel",
        stride=args.stride, mean_views_visible=round(float(w.sum(-1).mean()), 2),
        secs=round(time.time() - t2, 2))

    t3 = time.time()
    # physically-plausible reflectance box: barely-seen texels (grazing, few
    # views) otherwise park their unconstrained ks at the [0,100] default
    # bound and explode under novel lights
    rep = fit_per_texel(prob, args.model, engine="xla",
                        lower=(0.0, 0.0, 1e-3), upper=(2.0, 2.0, 1.0))
    fit_secs = time.time() - t3
    chi2 = np.asarray(rep.result.chi2)
    seen = w.sum(-1) >= 6
    kd_err = np.abs(rep.params[..., 0] - true_params[prob.face_ids][..., 0])
    metrics = {
        "texels": int(len(prob.face_ids)),
        "converged_fraction": rep.converged_fraction(),
        "chi2_median": float(np.median(chi2)),
        "chi2_median_wellseen": float(np.median(chi2[seen.nonzero()[0]])),
        "kd_abs_err_median_wellseen": float(np.median(kd_err[seen])),
        "mean_views_visible": float(w.sum(-1).mean()),
        "fit_secs": round(fit_secs, 2),
    }
    log("fit_done", mode="per_texel", **metrics)

    # relight under a novel light (none of the 12 measurement LEDs)
    novel = np.asarray([[60.0, 150.0, 320.0]], np.float32)
    relit_fit = relight(args.model, scene, rep.params, prob.face_ids, novel,
                        view=0)
    relit_truth = relight(args.model, scene, true_params, all_faces, novel,
                          view=0)
    # compare only where the fit has texels (stride leaves gaps)
    lut = np.full(mesh.num_faces, -1, np.int64)
    lut[prob.face_ids] = 1
    rm = scene.raster_map(0)
    mask = (rm.face_id >= 0) & (lut[np.maximum(rm.face_id, 0)] > 0)
    diff = np.abs(relit_fit - relit_truth)[mask]
    metrics["relight_mae"] = float(diff.mean())
    metrics["relight_median"] = float(np.median(diff))
    metrics["relight_p95"] = float(np.percentile(diff, 95))
    save_png(relit_fit, "relit_fit.png")
    save_png(relit_truth, "relit_truth.png")
    save_png(np.abs(relit_fit - relit_truth) * 5.0, "residual_x5.png")
    log("relight_done", light=novel[0].tolist(), mae=metrics["relight_mae"],
        p95=metrics["relight_p95"])

    with open(os.path.join(args.out, "metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=1)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
