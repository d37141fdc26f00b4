"""Joint-fit rendering applies the fitted normal offsets."""

import numpy as np
import pytest

from brdf_tpu.pipeline import render_image

from test_pipeline import _make_synthetic_scene


def test_normal_offsets_change_render():
    scene, params = _make_synthetic_scene(subdiv=1, seed=2)
    t = scene.mesh.num_faces
    faces = np.arange(t)
    img0 = render_image("blinn_phong", scene, params, faces, view=0,
                        use_vertex_normals=False)
    offsets = np.full((t, 2), 0.3, np.float32)
    img1 = render_image("blinn_phong", scene, params, faces, view=0,
                        normal_offsets=offsets)
    cov = scene.raster_map(0).coverage
    assert np.abs(img0[cov] - img1[cov]).mean() > 1e-3

    # zero offsets reproduce flat shading exactly
    img2 = render_image("blinn_phong", scene, params, faces, view=0,
                        normal_offsets=np.zeros((t, 2), np.float32))
    np.testing.assert_allclose(img2[cov], img0[cov], atol=1e-5)
