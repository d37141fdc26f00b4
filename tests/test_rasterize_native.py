"""Native (C++) rasterizer vs the NumPy reference implementation."""

import numpy as np
import pytest

from brdf_tpu.geometry import Camera
from brdf_tpu.geometry.primitives import icosphere
from brdf_tpu.geometry.rasterize import rasterize_mesh
from brdf_tpu.native import rasterizer_lib


@pytest.mark.skipif(rasterizer_lib() is None, reason="no C++ toolchain")
def test_native_matches_numpy():
    v, f = icosphere(3, radius=30.0, center=(0.0, 0.0, 120.0))
    cam = Camera.look_at(
        eye=(5.0, -10.0, 320.0), target=(0.0, 0.0, 120.0), f=300.0,
        width=200, height=160,
    )
    rm_native = rasterize_mesh(cam, v, f, native=True)
    rm_numpy = rasterize_mesh(cam, v, f, native=False)

    np.testing.assert_array_equal(rm_native.face_id, rm_numpy.face_id)
    cov = rm_numpy.coverage
    np.testing.assert_allclose(
        rm_native.depth[cov], rm_numpy.depth[cov], rtol=1e-6
    )
    np.testing.assert_allclose(
        rm_native.bary[cov], rm_numpy.bary[cov], rtol=1e-4, atol=1e-6
    )


@pytest.mark.skipif(rasterizer_lib() is None, reason="no C++ toolchain")
def test_native_speed_on_cup():
    import time

    from brdf_tpu.io import load_cal, load_obj

    v, f = load_obj("/root/reference/img/cup/cup.obj")
    cal = load_cal("/root/reference/img/cup/cup.cal")
    cam = Camera.from_calibration(cal, 800, 600)
    rasterize_mesh(cam, v, f, native=True)  # warm: projection dispatch, lib load
    t0 = time.perf_counter()
    rm = rasterize_mesh(cam, v, f, native=True)
    native_secs = time.perf_counter() - t0
    assert rm.coverage.mean() > 0.2
    # native should rasterize the 38k-face scene in ~100ms, far under the
    # multi-second NumPy path (loose bound: shared-CPU CI noise)
    assert native_secs < 2.0, native_secs
