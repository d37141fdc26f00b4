"""Tsai camera model (JAX pytree): projection, rays, frustum math.

Replaces the reference's camera handling, which was split between the ``.cal``
parser (``/root/reference/brdfdata.cpp:149-247``), the principal-point-shifted
``glFrustum`` (``glutcallbacks.cpp:626-642``) and live-GL ``gluProject`` calls
(``brdfdata.cpp:629-681``). Here the whole model is explicit, differentiable
math — and the radial distortion ``kappa1``, which the reference parsed but
dropped, is honored.

Conventions:
- World→camera: ``x_c = R (x_w - p)`` with ``R`` rows = calibrated axes
  ``(n, o, a)`` (unit, mutually orthogonal; ``brdfdata.h:63-69``).
- Image coordinates: ``u`` to the right, ``v`` **down** (row index), origin at
  the top-left pixel center; ``z_c > 0`` in front of the camera.
- Tsai projection: undistorted sensor coords ``Xu = f·x_c/z_c``,
  ``Yu = f·y_c/z_c``; radial distortion ``Xu = Xd (1 + kappa1 r²)`` with
  ``r² = Xd² + Yd²``; pixel ``u = cx + sx·Xd``, ``v = cy + Yd``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from brdf_tpu.io.cal import TsaiCalibration


class Camera(NamedTuple):
    """Fields are host NumPy arrays (same rationale as ``TriangleMesh``: on
    the tunneled TPU runtime, eager device ops on calibration constants cost
    roundtrips). The jnp methods below trace to device code when called under
    ``jit`` and fall back to eager host→device only if called eagerly."""

    rotation: np.ndarray  # (3, 3) world→camera; rows are camera axes in world
    position: np.ndarray  # (3,) camera center in world coords
    f: np.ndarray         # focal length (pixels)
    cx: np.ndarray
    cy: np.ndarray
    sx: np.ndarray        # horizontal scale factor
    kappa1: np.ndarray    # radial distortion
    width: int             # static — image width in pixels
    height: int            # static — image height in pixels

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_calibration(
        cls, cal: TsaiCalibration, width: int, height: int, dtype=jnp.float32
    ) -> "Camera":
        return cls(
            rotation=np.asarray(cal.rotation, dtype=dtype),
            position=np.asarray(cal.p, dtype=dtype),
            f=np.asarray(cal.f, dtype=dtype),
            cx=np.asarray(cal.cx, dtype=dtype),
            cy=np.asarray(cal.cy, dtype=dtype),
            sx=np.asarray(cal.sx, dtype=dtype),
            kappa1=np.asarray(cal.kappa1, dtype=dtype),
            width=width,
            height=height,
        )

    @classmethod
    def look_at(
        cls,
        eye,
        target,
        up=(0.0, 1.0, 0.0),
        f: float = 500.0,
        width: int = 256,
        height: int = 256,
        dtype=jnp.float32,
    ) -> "Camera":
        """Synthetic pinhole camera looking from ``eye`` at ``target``."""
        eye = np.asarray(eye, dtype=np.float64)
        target = np.asarray(target, dtype=np.float64)
        up = np.asarray(up, dtype=np.float64)
        a = target - eye
        a = a / np.linalg.norm(a)                      # optical axis
        n = np.cross(a, up)                            # right (+u)
        n = n / np.linalg.norm(n)
        o = np.cross(a, n)                             # down (+v), so v grows downward
        rot = np.stack([n, o, a], axis=0)
        return cls(
            rotation=np.asarray(rot, dtype=dtype),
            position=np.asarray(eye, dtype=dtype),
            f=np.asarray(f, dtype=dtype),
            cx=np.asarray((width - 1) / 2.0, dtype=dtype),
            cy=np.asarray((height - 1) / 2.0, dtype=dtype),
            sx=np.asarray(1.0, dtype=dtype),
            kappa1=np.asarray(0.0, dtype=dtype),
            width=width,
            height=height,
        )

    # -- transforms --------------------------------------------------------

    def world_to_camera(self, points: jnp.ndarray) -> jnp.ndarray:
        """(…, 3) world points → camera coords."""
        return (points - self.position) @ self.rotation.T

    def project(self, points: jnp.ndarray, eps: float = 1e-9):
        """Project world points to pixel coords.

        Returns ``(uv, depth)``: ``uv`` is (…, 2) with ``u`` = column,
        ``v`` = row (down); ``depth`` is camera-space z (positive in front).
        """
        pc = self.world_to_camera(points)
        z = pc[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) > eps, z, eps)
        xu = self.f * pc[..., 0] * inv_z
        yu = self.f * pc[..., 1] * inv_z
        xd, yd = _distort(xu, yu, self.kappa1)
        u = self.cx + self.sx * xd
        v = self.cy + yd
        return jnp.stack([u, v], axis=-1), z

    def pixel_rays(self, uv: jnp.ndarray):
        """Pixel coords (…, 2) → world-space unit ray directions from the
        camera center (undoing radial distortion)."""
        xd = (uv[..., 0] - self.cx) / self.sx
        yd = uv[..., 1] - self.cy
        r2 = xd * xd + yd * yd
        scale = 1.0 + self.kappa1 * r2
        xu = xd * scale
        yu = yd * scale
        d_cam = jnp.stack([xu / self.f, yu / self.f, jnp.ones_like(xu)], axis=-1)
        d_world = d_cam @ self.rotation  # R^T d
        return d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)

    def frustum_params(self, near: float, far: float):
        """Asymmetric frustum ``(l, r, b, t, n, f)`` honoring the principal
        point — the same construction as ``MakeFrustum``
        (``glutcallbacks.cpp:626-642``) but derived from intrinsics directly."""
        half_w = near * self.width / (2.0 * self.f * self.sx)
        half_h = near * self.height / (2.0 * self.f)
        off_x = 2.0 * (self.width / 2.0 - self.cx) / self.width * half_w
        off_y = 2.0 * (self.height / 2.0 - self.cy) / self.height * half_h
        return (
            -half_w + off_x,
            half_w + off_x,
            -half_h - off_y,
            half_h - off_y,
            near,
            far,
        )


def project_np(camera: Camera, points: np.ndarray):
    """NumPy mirror of :meth:`Camera.project` for host-side precompute
    (rasterization, view sampling): on tunneled TPU backends every eager jnp
    op is a device roundtrip, so the preprocessing path must never touch the
    device. Kept in lockstep with the jnp version (tested)."""
    rot = np.asarray(camera.rotation, np.float64)
    pos = np.asarray(camera.position, np.float64)
    f = float(camera.f)
    cx, cy = float(camera.cx), float(camera.cy)
    sx = float(camera.sx)
    kappa1 = float(camera.kappa1)

    pc = (np.asarray(points, np.float64) - pos) @ rot.T
    z = pc[..., 2]
    inv_z = 1.0 / np.where(np.abs(z) > 1e-9, z, 1e-9)
    xu = f * pc[..., 0] * inv_z
    yu = f * pc[..., 1] * inv_z
    xd, yd = xu, yu
    for _ in range(3):
        r2 = xd * xd + yd * yd
        s = 1.0 + kappa1 * r2
        xd, yd = xu / s, yu / s
    u = cx + sx * xd
    v = cy + yd
    return np.stack([u, v], axis=-1), z


def _distort(xu: jnp.ndarray, yu: jnp.ndarray, kappa1) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Invert ``Xu = Xd (1 + kappa1 r²)`` for ``Xd`` by fixed-point iteration.

    kappa1·r² is ≲1e-2 for the shipped calibrations (e.g. 1.66e-8 at
    ``img/cup/cup.cal``), so three iterations converge far below float32 eps.
    """

    def body(_, xy):
        xd, yd = xy
        r2 = xd * xd + yd * yd
        s = 1.0 + kappa1 * r2
        return xu / s, yu / s

    xd, yd = jax.lax.fori_loop(0, 3, body, (xu, yu))
    return xd, yd
