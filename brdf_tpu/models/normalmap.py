"""Joint normal + BRDF fitting: per-texel normal offsets fitted together with
material parameters (BASELINE config 4).

No reference equivalent — the reference's normals are fixed mesh face normals
(``brdfdata.cpp:314-330``). Here each texel carries a 2-DOF tangent-space
offset ``(nu, nv)``; the shading normal is ``normalize(N + nu·T + nv·B)``,
differentiable, so the LM solver fits geometry and material jointly. Channels are
fit *jointly* (RGB share the normal and roughness), so the parameter vector is

    [kd_r, kd_g, kd_b, ks_r, ks_g, ks_b, shape, nu, nv]      (m = 9)

and the residual stacks 3·V measurements. The box constraints on (nu, nv)
interact with the implicit unit-norm constraint exactly as flagged in
SURVEY.md §7 ("Hard parts"): the offset parameterization keeps the normal
unit-length by construction, so the box only bounds the tilt angle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from brdf_tpu.models.brdf import (
    MODELS,
    ShadingAngles,
    ShadingGeometry,
    angles_from_geometry,
)


def tangent_basis(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Orthonormal (T, B) frame for unit normals ``n`` (..., 3), branchless
    (Duff et al. construction)."""
    sign = jnp.where(n[..., 2] >= 0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, bt


def tangent_basis_np(n):
    """Pure-NumPy twin of :func:`tangent_basis` (identical Duff et al.
    construction) for host-side problem building — see
    ``models/brdf.py::shading_geometry_np`` for the TPU-access rationale."""
    import numpy as np

    n = np.asarray(n)
    sign = np.where(n[..., 2] >= 0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = np.stack(
        [1.0 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    bt = np.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, bt


class JointSpec(NamedTuple):
    base_model: str
    n_params: int
    lower: tuple
    upper: tuple
    n_shape: int = 1


def joint_spec(base_model: str = "cook_torrance", max_tilt: float = 0.6) -> JointSpec:
    """Joint parameter layout: ``[kd_rgb (3), ks_rgb (3), shape (k), nu, nv]``
    with k = the base lobe's shape-parameter count — m = 9 for the m=3
    isotropic lobes (shape at column 6, offsets at 7/8) and m = 11 for the
    m=5 anisotropic lobes (rough_x/rough_y/phi at columns 6-8, offsets at
    9/10; VERDICT r4 #2 — timber's winning lobes get the joint tier)."""
    base = MODELS[base_model]
    if base.linear != 2:
        raise ValueError(
            "joint fit needs a (kd, ks, shape...) base lobe; "
            f"{base_model!r} has linear={base.linear}"
        )
    k = base.n_params - 2
    lo = (
        (base.lower[0],) * 3 + (base.lower[1],) * 3
        + tuple(base.lower[2:]) + (-max_tilt, -max_tilt)
    )
    hi = (
        (base.upper[0],) * 3 + (base.upper[1],) * 3
        + tuple(base.upper[2:]) + (max_tilt, max_tilt)
    )
    return JointSpec(base_model, 8 + k, lo, hi, n_shape=k)


def perturbed_angles(
    geom: ShadingGeometry, nu: jnp.ndarray, nv: jnp.ndarray,
    tangent_frame: bool = False,
) -> ShadingAngles:
    """Recompute the cosine terms with the tangent-space-perturbed normal.
    ``nu``/``nv`` broadcast against ``geom.n[..., :-1]`` batch dims.
    ``tangent_frame=True`` also fills the tangent channels the anisotropic
    lobes need — the frame is re-derived from the PERTURBED normal, so the
    fitted ``phi`` orients the material axes in the fitted surface frame."""
    t, b = tangent_basis(geom.n)
    n_new = geom.n + nu[..., None] * t + nv[..., None] * b
    n_new = n_new / jnp.maximum(
        jnp.linalg.norm(n_new, axis=-1, keepdims=True), 1e-12
    )
    return angles_from_geometry(
        geom._replace(n=n_new), tangent_frame=tangent_frame
    )


def joint_eval(
    spec: JointSpec, params: jnp.ndarray, geom: ShadingGeometry
) -> jnp.ndarray:
    """Evaluate the joint model: params (..., 8+k) → intensities (..., V, 3)."""
    base = MODELS[spec.base_model]
    k = spec.n_shape
    nu = params[..., 6 + k]
    nv = params[..., 7 + k]
    ang = perturbed_angles(geom, nu, nv, tangent_frame=base.tangent)
    outs = []
    for c in range(3):
        p_c = jnp.concatenate(
            [params[..., c : c + 1], params[..., 3 + c : 4 + c],
             params[..., 6 : 6 + k]], axis=-1
        )
        outs.append(base.fn(p_c, ang))
    return jnp.stack(outs, axis=-1)   # (..., V, 3)


def joint_residual(spec: JointSpec):
    """Residual closure for the LM solver: data = (geom, target (V,3), w).

    ``w`` is (V,) shared across channels, or (V, 3) PER-CHANNEL — channels
    are independent measurements (the reference gathered them separately,
    ``brdfdata.cpp:945-960``), so per-channel saturation masks and IRLS
    weights must reach the joint fit per channel (VERDICT r4 #1: cup
    saturates 0.22/0.27 in G/B only)."""

    def residual(p, data):
        geom, target, w = data
        pred = joint_eval(spec, p, geom)
        wb = w if w.ndim == target.ndim else w[..., None]
        return ((pred - target) * wb).reshape(-1)

    return residual


def joint_p0_from_channelwise(
    channel_params: jnp.ndarray,  # (..., 3, m_base): per-channel (kd, ks, shape…)
) -> jnp.ndarray:
    """Build a joint start from independent per-channel fits: kd/ks carry
    over, the shape parameter(s) average over channels, the normal offset
    starts at 0. Works for any base-lobe shape count (m=3 → 9 joint params,
    m=5 aniso → 11)."""
    kd = channel_params[..., :, 0]
    ks = channel_params[..., :, 1]
    shape = jnp.mean(channel_params[..., :, 2:], axis=-2)   # (..., k)
    zeros = jnp.zeros_like(shape[..., :1])
    return jnp.concatenate([kd, ks, shape, zeros, zeros], axis=-1)
