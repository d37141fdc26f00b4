"""Light-rig geometry.

The reference hard-codes the measured 3D positions of its 16-LED capture rig
(4 rings × 4 LEDs) inside ``CBRDFdata::InitLEDs``
(``/root/reference/brdfdata.cpp:683-797``). Those positions are *measured data*
about the physical rig the datasets were captured with, so the same grid is
reproduced here as data — but generalized: any (L, 3) light-position array is a
valid rig, and helpers build parametric rigs for synthetic scenes.
"""

from __future__ import annotations

import numpy as np

# Measured rig envelope (mm), from the comments and constants in
# brdfdata.cpp:683-703: all LEDs share x = 303.5; y spans [-157.1, -2.3] and
# z spans [555.3, 645.8] on a 4×4 serpentine grid.
_X = 303.5
_MIN_Y, _MAX_Y = -157.1, -2.3
_MIN_Z, _MAX_Z = 555.3, 645.8


def led_rig_positions() -> np.ndarray:
    """The reference's measured 16-LED grid, ``(16, 3) float64``.

    LED ordering follows the capture order used by the datasets (serpentine:
    each ring of 4 alternates y direction as z steps through 4 levels), per
    the explicit assignments at ``brdfdata.cpp:705-745``.
    """
    y_step = (_MAX_Y - _MIN_Y) / 3.0
    z_step = (_MAX_Z - _MIN_Z) / 3.0
    ys = np.array([_MAX_Y, _MAX_Y - y_step, _MIN_Y + y_step, _MIN_Y])
    zs = np.array([_MIN_Z, _MIN_Z + z_step, _MAX_Z - z_step, _MAX_Z])
    led = np.zeros((16, 3), dtype=np.float64)
    led[:, 0] = _X
    for i in range(16):
        ring, pos = divmod(i, 4)
        # serpentine: odd rings run the y sequence in reverse
        y_idx = pos if ring % 2 == 0 else 3 - pos
        led[i, 1] = ys[y_idx]
        led[i, 2] = zs[ring]
    return led


def ring_rig(
    num_lights: int,
    radius: float,
    height: float = 0.0,
    center: np.ndarray | None = None,
    axis: str = "y",
) -> np.ndarray:
    """A parametric ring of ``num_lights`` point lights (synthetic scenes)."""
    if center is None:
        center = np.zeros(3)
    theta = np.linspace(0.0, 2.0 * np.pi, num_lights, endpoint=False)
    c, s = np.cos(theta), np.sin(theta)
    if axis == "y":
        pts = np.stack([radius * c, np.full_like(c, height), radius * s], axis=-1)
    elif axis == "z":
        pts = np.stack([radius * c, radius * s, np.full_like(c, height)], axis=-1)
    else:
        pts = np.stack([np.full_like(c, height), radius * c, radius * s], axis=-1)
    return pts + np.asarray(center)[None]


def grid_rig(
    rows: int,
    cols: int,
    y_range: tuple[float, float],
    z_range: tuple[float, float],
    x: float,
) -> np.ndarray:
    """A planar serpentine grid rig like the reference's, any size."""
    ys = np.linspace(y_range[1], y_range[0], cols)
    zs = np.linspace(z_range[0], z_range[1], rows)
    out = np.zeros((rows * cols, 3), dtype=np.float64)
    for i in range(rows * cols):
        ring, pos = divmod(i, cols)
        y_idx = pos if ring % 2 == 0 else cols - 1 - pos
        out[i] = (x, ys[y_idx], zs[ring])
    return out
