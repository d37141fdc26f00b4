"""Multi-camera rig support (BASELINE config 5 machinery): per-view cameras
from the reference's `Camera Calibrations/` set, cross-view reprojection
sampling with per-view z-buffers, and parameter recovery."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from brdf_tpu.geometry import Camera, TriangleMesh
from brdf_tpu.geometry.primitives import icosphere
from brdf_tpu.io import load_cal
from brdf_tpu.io.rig import ring_rig
from brdf_tpu.pipeline import (
    Scene,
    build_pixel_problem,
    fit_per_texel,
    render_image,
)

CAL_DIR = "/root/reference/Camera Calibrations"


def test_all_calibration_files_parse():
    cals = [f for f in os.listdir(CAL_DIR) if f.endswith((".cal", ".xml"))]
    assert len(cals) >= 11  # the multi-camera rig set
    for f in cals:
        cal = load_cal(os.path.join(CAL_DIR, f))
        R = cal.rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.isfinite(cal.p).all()


@pytest.fixture(scope="module")
def multicam_scene():
    """Synthetic multi-camera scene: a sphere watched by 12 distinct cameras
    arranged around it, each view lit by its own light."""
    rng = np.random.default_rng(0)
    v, f = icosphere(3, radius=30.0, center=(0.0, 0.0, 0.0))
    mesh = TriangleMesh.from_arrays(v, f, dtype=jnp.float32)

    eyes = ring_rig(12, radius=300.0, height=80.0, axis="y")
    cams = [
        Camera.look_at(eye=e, target=(0, 0, 0), up=(0, 1, 0), f=300.0,
                       width=160, height=120)
        for e in eyes
    ]
    lights = ring_rig(12, radius=250.0, height=180.0, axis="y")

    t = mesh.num_faces
    params = np.stack(
        [
            rng.uniform(0.2, 0.8, (t, 3)),
            rng.uniform(0.2, 0.9, (t, 3)),
            rng.uniform(3.0, 15.0, (t, 3)),
        ],
        axis=-1,
    ).astype(np.float32)

    scene = Scene(
        mesh=mesh, cameras=cams, lights=lights,
        images=np.zeros((12, 120, 160, 3), np.float32), name="multicam",
    )
    all_faces = np.arange(t)
    imgs = [
        render_image("blinn_phong", scene, params, all_faces, view=vi,
                     use_vertex_normals=False)
        for vi in range(12)
    ]
    scene.images = np.stack(imgs).astype(np.float32)
    return scene, params


def test_views_see_different_sides(multicam_scene):
    scene, _ = multicam_scene
    maps = [scene.raster_map(v).face_id for v in range(12)]
    # opposite cameras must see (almost) disjoint face sets
    front = set(np.unique(maps[0])) - {-1}
    back = set(np.unique(maps[6])) - {-1}
    overlap = len(front & back) / max(len(front), 1)
    assert overlap < 0.25


def test_multicam_pixel_fit_recovers(multicam_scene):
    scene, true_params = multicam_scene
    prob = build_pixel_problem(scene, reference_view=0, stride=3,
                               smooth_normals=False)
    w = np.asarray(prob.weights)
    # cross-view visibility: a front texel is seen by ~half the cameras
    assert 3.0 < w.sum(-1).mean() < 12.0
    rep = fit_per_texel(prob, "blinn_phong")
    seen = w.sum(-1) >= 6
    chi2 = np.asarray(rep.result.chi2)
    # cross-camera sampling/visibility correctness shows up as small-residual
    # fits. Two inherent noise floors: bilinear samples blend neighboring
    # faces' (different) params in non-reference views, and each view carries
    # only one light (dark when opposite the camera) — so neither χ² ≈ 0 nor
    # tight kd recovery is expected from this rig.
    assert np.median(chi2[seen.nonzero()[0]]) < 1e-2
    kd_err = np.abs(rep.params[:, :, 0] - true_params[prob.face_ids][:, :, 0])
    assert np.median(kd_err[seen]) < 0.1
