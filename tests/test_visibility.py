"""Cast-shadow visibility (geometry/visibility.py).

The reference has no visibility term anywhere in its fit
(``brdfdata.cpp:1188-1227``); these tests pin the behavior of the TPU
framework's replacement — shadow maps rendered from each light through the
same z-buffer rasterizer as the pixel↔surface map."""

import numpy as np
import pytest

from brdf_tpu.geometry.mesh import TriangleMesh
from brdf_tpu.geometry.primitives import icosphere, plane
from brdf_tpu.geometry.visibility import light_camera, light_visibility


def _scene_plane_with_occluder():
    """A z=0 ground plane with a small square occluder floating at z=1,
    centered over the origin (both z-facing)."""
    pv, pf = plane(size=4.0, resolution=8)                       # ground
    ov, of_ = plane(size=0.8, center=(0.0, 0.0, 1.0), resolution=1)
    verts = np.concatenate([ov, pv])
    faces = np.concatenate([of_, pf + len(ov)])
    return TriangleMesh.from_arrays(verts, faces)


def test_occluder_casts_shadow():
    mesh = _scene_plane_with_occluder()
    lights = np.array([[0.0, 0.0, 10.0]])          # directly above
    # probe points ON the ground plane: center (under the occluder) and the
    # four corners (well outside its footprint)
    pts = np.array([
        [0.0, 0.0, 0.0],
        [1.5, 1.5, 0.0],
        [-1.5, 1.5, 0.0],
        [1.5, -1.5, 0.0],
        [-1.5, -1.5, 0.0],
    ])
    vis = light_visibility(mesh, pts, lights, resolution=256)
    assert vis.shape == (5, 1)
    assert vis[0, 0] == 0.0                        # shadowed by the occluder
    assert np.all(vis[1:, 0] == 1.0)               # corners lit


def test_oblique_light_moves_the_shadow():
    mesh = _scene_plane_with_occluder()
    # light far to the +x side: the shadow of the z=1 occluder shifts to -x
    lights = np.array([[10.0, 0.0, 10.0]])
    pts = np.array([
        [0.0, 0.0, 0.0],      # under the occluder, no longer shadowed center
        [-1.0, 0.0, 0.0],     # shadow landed here (offset ≈ -1 at 45°)
        [1.5, 0.0, 0.0],      # sunny side
    ])
    vis = light_visibility(mesh, pts, lights, resolution=512)
    assert vis[1, 0] == 0.0
    assert vis[2, 0] == 1.0


def test_no_self_shadow_acne():
    """A single convex surface lit from outside must be fully visible —
    the discretization bias has to suppress shadow acne."""
    verts, faces = icosphere(subdivisions=3, radius=1.0)
    mesh = TriangleMesh.from_arrays(verts, faces)
    light = np.array([[0.0, 0.0, 5.0]])
    # all centroids on the lit hemisphere (facing the light)
    front = mesh.centroids[mesh.centroids[:, 2] > 0.25]
    vis = light_visibility(mesh, front, light, resolution=512)
    assert vis.mean() > 0.995
    # and the back hemisphere IS occluded (by the sphere itself)
    back = mesh.centroids[mesh.centroids[:, 2] < -0.25]
    vis_b = light_visibility(mesh, back, light, resolution=512)
    assert vis_b.mean() < 0.05


def test_light_inside_scene_falls_back_lit():
    verts, faces = icosphere(subdivisions=2, radius=1.0)
    mesh = TriangleMesh.from_arrays(verts, faces)
    vis = light_visibility(mesh, mesh.centroids, np.zeros((1, 3)))
    assert np.all(vis == 1.0)
    assert light_camera(np.zeros(3), np.zeros(3), 1.0) is None


def test_shadow_weights_zero_out_problem_views():
    """build_face_problem(shadow_weights=True) must zero exactly the
    weights of shadowed (texel, light) pairs and leave the rest intact."""
    from brdf_tpu.geometry.camera import Camera
    from brdf_tpu.pipeline.fit import build_face_problem
    from brdf_tpu.pipeline.scene import Scene

    mesh = _scene_plane_with_occluder()
    cam = Camera.look_at(
        eye=(0.0, -3.0, 3.5), target=(0.0, 0.0, 0.0), up=(0, 0, 1),
        f=220.0, width=160, height=120,
    )
    lights = np.array([[0.0, 0.0, 10.0], [8.0, 0.0, 8.0]], np.float64)
    images = np.full((2, 120, 160, 3), 0.5, np.float32)
    scene = Scene(mesh=mesh, cameras=[cam, cam], lights=lights,
                  images=images, name="occluder")

    base = build_face_problem(scene)
    shad = build_face_problem(scene, shadow_weights=True)
    w0 = np.asarray(base.weights)
    w1 = np.asarray(shad.weights)
    assert w1.shape == w0.shape
    # shadowing only ever REMOVES weight
    assert np.all(w1 <= w0 + 1e-7)
    newly_zero = (w0 > 0) & (w1 == 0)
    assert newly_zero.any(), "the overhead light must shadow some faces"
    # faces under the occluder footprint lose the overhead light (view 0)
    fid_under = np.where(
        (np.abs(mesh.centroids[:, 0]) < 0.25)
        & (np.abs(mesh.centroids[:, 1]) < 0.25)
        & (np.abs(mesh.centroids[:, 2]) < 1e-6)
    )[0]
    lut = {int(f): i for i, f in enumerate(shad.face_ids)}
    rows = [lut[int(f)] for f in fid_under if int(f) in lut]
    assert rows, "ground faces under the occluder should be visible to the camera"
    assert np.all(w1[rows, 0] == 0.0)


@pytest.mark.parametrize("scene_dir", ["/root/reference/img/cup"])
def test_real_mesh_smoke(scene_dir):
    """LED rig + cup mesh: visibility is well-formed and mostly lit for the
    (mostly convex) cup; the concave handle region may self-shadow."""
    import os

    from brdf_tpu.io import led_rig_positions

    obj = [f for f in os.listdir(scene_dir) if f.endswith(".obj")][0]
    mesh = TriangleMesh.from_obj(os.path.join(scene_dir, obj))
    lights = led_rig_positions()[:4]
    vis = light_visibility(mesh, mesh.centroids, lights, resolution=512)
    assert vis.shape == (mesh.num_faces, 4)
    assert set(np.unique(vis)).issubset({0.0, 1.0})
    # the rig faces the object: a solid majority of faces see each LED
    assert vis.mean() > 0.5
