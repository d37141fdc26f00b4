"""Data-layer tests: OBJ meshes, Tsai .cal files, image stacks, LED rig."""

import numpy as np
import pytest

from brdf_tpu.io import load_cal, load_obj, led_rig_positions
from brdf_tpu.io.cal import parse_cal_text
from brdf_tpu.io.obj import face_normals, vertex_normals

REF_IMG = "/root/reference/img"


def test_load_obj_bunny():
    v, f = load_obj(f"{REF_IMG}/bunny/bunny.obj")
    assert v.shape == (13344, 3)
    assert f.shape == (25183, 3)
    assert f.min() >= 0 and f.max() < len(v)


def test_load_obj_cup():
    v, f = load_obj(f"{REF_IMG}/cup/cup.obj")
    assert v.shape[0] == 20384
    assert f.shape[0] == 38342


def test_face_normals_unit():
    v, f = load_obj(f"{REF_IMG}/timber/timber.obj")
    fn = face_normals(v, f)
    norms = np.linalg.norm(fn, axis=-1)
    ok = norms > 0
    np.testing.assert_allclose(norms[ok], 1.0, rtol=1e-12)


def test_vertex_normals_unit_rows():
    """Each vertex normal must be unit — the reference normalized the whole
    matrix instead (brdfdata.cpp:362), which this framework fixes."""
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1.0]])
    f = np.array([[0, 1, 2], [1, 3, 2]], dtype=np.int32)
    vn = vertex_normals(v, f)
    norms = np.linalg.norm(vn, axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-12)


def test_cal_parse_cup():
    cal = load_cal(f"{REF_IMG}/cup/cup.cal")
    assert cal.camera_model == "CameraTsai"
    np.testing.assert_allclose(cal.cx, 388.26227794345664)
    np.testing.assert_allclose(cal.f, 662.27582813086394)
    # kappa1 preserved (the reference's WriteValue dropped it,
    # brdfdata.cpp:195-247)
    np.testing.assert_allclose(cal.kappa1, 1.6594307295081538e-08)
    # axes unit & orthogonal (documented invariant, brdfdata.h:63-69)
    R = cal.rotation
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


@pytest.mark.parametrize("scene", ["cup", "bunny", "timber"])
def test_cal_parse_all_scenes(scene):
    cal = load_cal(f"{REF_IMG}/{scene}/{scene}.cal")
    assert np.isfinite(cal.rotation).all() and np.isfinite(cal.p).all()


def test_cal_open_tag_style():
    """The reference scanner accepted `<tag>value<` without a closing tag
    (brdfdata.cpp:160-186); so does ours."""
    vals = parse_cal_text("<cx>1.5<\n<cy>2.5</cy>")
    assert vals["cx"] == "1.5"
    assert vals["cy"] == "2.5"


def test_led_rig_grid_variant_matches_reference_assignments():
    led = led_rig_positions("grid")
    assert led.shape == (16, 3)
    np.testing.assert_allclose(led[:, 0], 303.5)
    # explicit corner assignments from brdfdata.cpp:705-745
    np.testing.assert_allclose(led[0], [303.5, -2.3, 555.3])
    np.testing.assert_allclose(led[3], [303.5, -157.1, 555.3])
    np.testing.assert_allclose(led[4], [303.5, -157.1, 555.3 + (645.8 - 555.3) / 3])
    np.testing.assert_allclose(led[12], [303.5, -157.1, 645.8])
    np.testing.assert_allclose(led[15], [303.5, -2.3, 645.8])


def test_led_rig_default_is_cylinder():
    led = led_rig_positions()
    assert led.shape == (16, 3)
    # ring heights 365/260/150/45 − 115 (brdfdata.cpp:747-795 comments)
    np.testing.assert_allclose(led[0:4, 1], 250.0)
    np.testing.assert_allclose(led[12:16, 1], -70.0)
    # all on the radius-305 cylinder
    np.testing.assert_allclose(np.hypot(led[:, 0], led[:, 2]), 305.0)
    # azimuth ordering: x increases with i%4 within a ring
    assert (np.diff(led[0:4, 0]) > 0).all()


def test_image_stack_loading():
    from brdf_tpu.io import load_scene_images

    stack = load_scene_images(f"{REF_IMG}/cup", num_images=16)
    assert stack.shape == (16, 600, 800, 3)
    assert stack.dtype == np.float32
    assert 0.0 <= stack.min() and stack.max() <= 1.0
