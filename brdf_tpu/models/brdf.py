"""Differentiable BRDF shading models.

Replaces the reference's shading-geometry kernels and residual model
(``GetCosLN``/``GetCosNH``/``GetCosRV`` at ``/root/reference/brdfdata.cpp:799-943``
and ``BRDFFunc`` at ``brdfdata.cpp:969-989``) with batched, differentiable JAX
math. The reference's documented bugs are **fixed**, not replicated
(SURVEY.md §2.1):

- ``GetCosRV`` built the light vector as ``(x−led_x, x−led_y, x−led_z)``
  reusing the centroid's ``x`` for all components (``brdfdata.cpp:835``) and
  returned ``R·P`` instead of ``R·V`` (``brdfdata.cpp:849``). Here the
  reflection vector is ``R = 2 (N·L) N − L`` and the returned quantity is
  ``R·V``.
- Phong's energy-conserving normalization is ``(n+2)/(2π)``; the reference
  *multiplied* by π (``(p[2]+2)/2·π``, ``brdfdata.cpp:981``) in the fit while
  the renderer divided (``glutcallbacks.cpp:420-428``). Here both paths share
  one correct implementation.

All model evaluators are shaped ``f(params (..., M), angles (..., V-dims)) →
intensity`` and broadcast, so the same code serves per-texel fitting (vmapped
over texels), whole-image rendering, and float64 reference evaluation.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


class ShadingGeometry(NamedTuple):
    """Unit vectors for each (texel, light) pair.

    ``l`` and ``v`` are (..., V, 3); ``n`` is (..., 3) (per texel, broadcast
    over lights). Kept around for models that perturb the normal (normal-map
    fitting); plain lobe fits only need :class:`ShadingAngles`.
    """

    n: jnp.ndarray  # (..., 3) unit surface normal
    l: jnp.ndarray  # (..., V, 3) unit texel→light
    v: jnp.ndarray  # (..., V, 3) unit texel→eye


class ShadingAngles(NamedTuple):
    """Cosine terms for each (texel, light) pair; all (..., V).

    The last six channels are the tangent-frame components needed by the
    anisotropic lobes (``ward_aniso`` / ``cook_torrance_aniso``). They are
    ``None`` unless the angles were built with ``tangent_frame=True`` — the
    isotropic lobes never read them, and ``None`` pytree leaves cost nothing
    under ``jit``/``vmap``/``shard_map``. The frame is the canonical
    per-normal basis of :func:`brdf_tpu.models.normalmap.tangent_basis`;
    anisotropic lobes carry an in-plane rotation parameter ``phi`` that
    orients the material's principal axes inside that frame, so no per-texel
    UV tangents are required (and the rotation itself is fittable).
    """

    cos_ln: jnp.ndarray  # N·L   (the reference's phi, GetCosLN)
    cos_nh: jnp.ndarray  # N·H   (the reference's theta', GetCosNH)
    cos_rv: jnp.ndarray  # R·V   (the reference's theta, GetCosRV — fixed)
    cos_vn: jnp.ndarray  # N·V   (needed by Cook-Torrance; not in reference)
    cos_th: jnp.ndarray | None = None  # T·H
    cos_bh: jnp.ndarray | None = None  # B·H
    cos_tl: jnp.ndarray | None = None  # T·L
    cos_bl: jnp.ndarray | None = None  # B·L
    cos_tv: jnp.ndarray | None = None  # T·V
    cos_bv: jnp.ndarray | None = None  # B·V


def _normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), _EPS)


def shading_geometry(
    points: jnp.ndarray,     # (..., 3) surface points (triangle centroids / texels)
    normals: jnp.ndarray,    # (..., 3) unit normals
    eye: jnp.ndarray,        # (3,) shared camera, or (V, 3) per-view cameras
    lights: jnp.ndarray,     # (V, 3) light positions (world)
) -> ShadingGeometry:
    l = _normalize(lights - points[..., None, :])            # (..., V, 3)
    if eye.ndim == 1:
        v = _normalize(eye - points)[..., None, :]           # (..., 1, 3)
    else:
        v = _normalize(eye - points[..., None, :])           # (..., V, 3)
    v = jnp.broadcast_to(v, l.shape)
    return ShadingGeometry(n=normals, l=l, v=v)


def angles_from_geometry(
    geom: ShadingGeometry, tangent_frame: bool = False
) -> ShadingAngles:
    n = geom.n[..., None, :]                                  # (..., 1, 3)
    cos_ln = jnp.sum(n * geom.l, axis=-1)
    h = _normalize(geom.l + geom.v)
    cos_nh = jnp.sum(n * h, axis=-1)
    # reflection of L about N: R = 2 (N·L) N − L   (fixes brdfdata.cpp:835,849)
    r = 2.0 * cos_ln[..., None] * n - geom.l
    cos_rv = jnp.sum(r * geom.v, axis=-1)
    cos_vn = jnp.sum(n * geom.v, axis=-1)
    ext = {}
    if tangent_frame:
        from brdf_tpu.models.normalmap import tangent_basis

        t, b = tangent_basis(geom.n)
        t = t[..., None, :]
        b = b[..., None, :]
        ext = dict(
            cos_th=jnp.sum(t * h, axis=-1), cos_bh=jnp.sum(b * h, axis=-1),
            cos_tl=jnp.sum(t * geom.l, axis=-1), cos_bl=jnp.sum(b * geom.l, axis=-1),
            cos_tv=jnp.sum(t * geom.v, axis=-1), cos_bv=jnp.sum(b * geom.v, axis=-1),
        )
    return ShadingAngles(
        cos_ln=cos_ln, cos_nh=cos_nh, cos_rv=cos_rv, cos_vn=cos_vn, **ext
    )


def shading_geometry_np(points, normals, eye, lights) -> ShadingGeometry:
    """Pure-NumPy twin of :func:`shading_geometry` for host-side problem
    building: on the tunneled TPU runtime every eager device op is a
    roundtrip and every distinct jitted program a (minutes-slow) remote
    compile, so precompute that doesn't need autodiff must never touch the
    device (CLAUDE.md TPU-access discipline). Returns NumPy-backed
    ``ShadingGeometry`` (float64 accumulation, cast by the caller)."""
    points = np.asarray(points, np.float64)
    normals = np.asarray(normals, np.float64)
    eye = np.asarray(eye, np.float64)
    lights = np.asarray(lights, np.float64)

    def norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), _EPS)

    l = norm(lights - points[..., None, :])
    if eye.ndim == 1:
        v = norm(eye - points)[..., None, :]
    else:
        v = norm(eye - points[..., None, :])
    v = np.broadcast_to(v, l.shape)
    return ShadingGeometry(n=normals, l=l, v=v)


def angles_from_geometry_np(
    geom: ShadingGeometry, tangent_frame: bool = False, dtype=np.float32
) -> ShadingAngles:
    """Pure-NumPy twin of :func:`angles_from_geometry` (same math, same
    tangent basis); see :func:`shading_geometry_np` for why it exists."""
    n = np.asarray(geom.n, np.float64)[..., None, :]
    l = np.asarray(geom.l, np.float64)
    v = np.asarray(geom.v, np.float64)
    cos_ln = np.sum(n * l, axis=-1)
    h = l + v
    h = h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), _EPS)
    cos_nh = np.sum(n * h, axis=-1)
    r = 2.0 * cos_ln[..., None] * n - l
    cos_rv = np.sum(r * v, axis=-1)
    cos_vn = np.sum(n * v, axis=-1)
    ext = {}
    if tangent_frame:
        from brdf_tpu.models.normalmap import tangent_basis_np

        t, b = tangent_basis_np(np.asarray(geom.n, np.float64))
        t = t[..., None, :]
        b = b[..., None, :]
        ext = dict(
            cos_th=np.sum(t * h, -1).astype(dtype),
            cos_bh=np.sum(b * h, -1).astype(dtype),
            cos_tl=np.sum(t * l, -1).astype(dtype),
            cos_bl=np.sum(b * l, -1).astype(dtype),
            cos_tv=np.sum(t * v, -1).astype(dtype),
            cos_bv=np.sum(b * v, -1).astype(dtype),
        )
    return ShadingAngles(
        cos_ln=cos_ln.astype(dtype), cos_nh=cos_nh.astype(dtype),
        cos_rv=cos_rv.astype(dtype), cos_vn=cos_vn.astype(dtype), **ext,
    )


def shading_angles(points, normals, eye, lights, tangent_frame: bool = False) -> ShadingAngles:
    """Cosine terms for every (texel, light) pair — the batched, corrected
    analogue of the reference's per-surface loops at ``brdfdata.cpp:799-943``.

    ``tangent_frame=True`` additionally fills the tangent-frame channels the
    anisotropic lobes need (see :class:`ShadingAngles`)."""
    return angles_from_geometry(
        shading_geometry(points, normals, eye, lights), tangent_frame=tangent_frame
    )


# ---------------------------------------------------------------------------
# Lobes
# ---------------------------------------------------------------------------


def _safe_pow(base: jnp.ndarray, expo: jnp.ndarray) -> jnp.ndarray:
    """``max(base, 0)^expo`` with finite gradients at base<=0."""
    clamped = jnp.maximum(base, _EPS)
    return jnp.where(base > 0, jnp.power(clamped, expo), 0.0)


def phong(params: jnp.ndarray, angles: ShadingAngles) -> jnp.ndarray:
    """Energy-conserving Phong: ``I = kd·⟨N·L⟩ + ks·(n+2)/(2π)·⟨R·V⟩ⁿ``.

    Same lobe as ``BRDFFunc``'s model 0 (``brdfdata.cpp:978-982``) but with the
    normalization correctly *dividing* by 2π.
    """
    kd = params[..., 0:1]
    ks = params[..., 1:2]
    n = params[..., 2:3]
    diff = kd * jnp.maximum(angles.cos_ln, 0.0)
    # horizon mask: no specular from lights below the surface (the reference's
    # BRDFFunc leaked specular for cos_ln ≤ 0)
    spec = ks * (n + 2.0) / (2.0 * jnp.pi) * _safe_pow(angles.cos_rv, n)
    return diff + spec * (angles.cos_ln > 0)


def blinn_phong(params: jnp.ndarray, angles: ShadingAngles) -> jnp.ndarray:
    """``I = kd·⟨N·L⟩ + ks·⟨N·H⟩ⁿ`` — ``BRDFFunc`` model 1
    (``brdfdata.cpp:983-987``)."""
    kd = params[..., 0:1]
    ks = params[..., 1:2]
    n = params[..., 2:3]
    diff = kd * jnp.maximum(angles.cos_ln, 0.0)
    spec = ks * _safe_pow(angles.cos_nh, n)
    return diff + spec * (angles.cos_ln > 0)


def cook_torrance(params: jnp.ndarray, angles: ShadingAngles) -> jnp.ndarray:
    """Cook-Torrance with GGX distribution, Smith-GGX visibility and Schlick
    Fresnel (F0 folded into ks):

    ``I = kd/π·⟨N·L⟩ + ks · D(h)·V(l,v)·F(h) · ⟨N·L⟩``

    where ``V = G/(4 ⟨N·L⟩⟨N·V⟩)`` is the height-correlated Smith visibility.
    Params: ``(kd, ks, roughness)``. This is the extension lobe the BASELINE
    configs 3-5 call for; the reference had no microfacet model.
    """
    kd = params[..., 0:1]
    ks = params[..., 1:2]
    rough = jnp.maximum(params[..., 2:3], 1e-3)
    a2 = (rough * rough) ** 2

    nl = jnp.maximum(angles.cos_ln, 0.0)
    nv = jnp.maximum(angles.cos_vn, _EPS)
    nh = jnp.maximum(angles.cos_nh, 0.0)

    # GGX normal distribution
    d_denom = nh * nh * (a2 - 1.0) + 1.0
    d = a2 / jnp.maximum(jnp.pi * d_denom * d_denom, _EPS)

    # height-correlated Smith visibility (G / (4 nl nv))
    lam_v = nl * jnp.sqrt(nv * nv * (1.0 - a2) + a2)
    lam_l = nv * jnp.sqrt(nl * nl * (1.0 - a2) + a2)
    vis = 0.5 / jnp.maximum(lam_v + lam_l, _EPS)

    # Fresnel is F0 ≡ 1 here (folded into ks); cook_torrance_fresnel adds a
    # live Schlick term with a fitted f0.
    spec = ks * d * vis * nl
    diff = kd / jnp.pi * nl
    return diff + spec * (nl > 0)


def _lv_from_angles(angles: ShadingAngles) -> jnp.ndarray:
    """Recover L·V from cos_rv and the normal cosines:
    R = 2(N·L)N − L ⇒ R·V = 2(N·L)(N·V) − L·V."""
    return 2.0 * angles.cos_ln * angles.cos_vn - angles.cos_rv


def cook_torrance_fresnel(params: jnp.ndarray, angles: ShadingAngles) -> jnp.ndarray:
    """4-parameter Cook-Torrance ``(kd, ks, roughness, f0)`` with a live
    Schlick Fresnel term.

    IDENTIFIABILITY: ks and f0 are coupled through the product ``ks·F(f0)``
    — at rig-scale view counts (16) many (ks, f0) splits reproduce the data
    exactly, so the individual values are only trustworthy where the
    grazing-angle tail ``(1−V·H)⁵`` is well sampled. Measured synthetic
    recovery at 16 views: 0.54 (LM), 0.63 (2-D profiled Newton), 0.78 with
    the exact scale-profiled solve (``solver/varpro.py::
    varpro_fit_fresnel_lin``, the ``engine="varpro"`` dispatch, which
    removes the degenerate direction in closed form — Schlick's F is affine
    in f0, making the lobe linear in (kd, ks·f0, ks·(1−f0))); the residual
    tail persists at float64 with χ² = 0 and is a VIEW-COUNT ambiguity, not
    a solver artifact. ``fit --stats`` / ``export --stats`` flag it on real
    runs; prefer plain ``cook_torrance`` unless f0 is specifically needed
    (on bunny the live Fresnel adds no reprojection gain, r3 commit
    b293a4d)."""
    base = cook_torrance(params[..., :3], angles)
    kd = params[..., 0:1]
    ks = params[..., 1:2]
    f0 = params[..., 3:4]
    nl = jnp.maximum(angles.cos_ln, 0.0)
    lv = _lv_from_angles(angles)
    vh = jnp.sqrt(jnp.maximum((1.0 + lv) / 2.0, _EPS))
    fresnel = f0 + (1.0 - f0) * _safe_pow(1.0 - vh, jnp.asarray(5.0))
    # re-scale the specular part of `base` by Fresnel: base = diff + spec
    diff = kd / jnp.pi * nl
    spec = base - diff
    return diff + spec * fresnel


def lambert(params: jnp.ndarray, angles: ShadingAngles) -> jnp.ndarray:
    """Pure diffuse ``I = kd/π·⟨N·L⟩`` — the 1-parameter baseline lobe."""
    kd = params[..., 0:1]
    return kd / jnp.pi * jnp.maximum(angles.cos_ln, 0.0)


def oren_nayar(params: jnp.ndarray, angles: ShadingAngles) -> jnp.ndarray:
    """Oren-Nayar rough diffuse (qualitative model), params ``(kd, sigma)``
    with sigma the surface-roughness std-dev in radians:

    ``I = kd/π·⟨N·L⟩·(A + B·max(0, cosφΔ)·sinα·tanβ)``

    where ``A = 1 − σ²/(2(σ²+0.33))``, ``B = 0.45 σ²/(σ²+0.09)``,
    ``α = max(θi, θr)``, ``β = min(θi, θr)``. The azimuthal difference comes
    from the cosine channels alone: ``cosφΔ = (L·V − cosθi cosθr)/(sinθi sinθr)``
    with ``L·V`` recovered via :func:`_lv_from_angles`. No reference
    counterpart (the reference had only Phong-family lobes); extension lobe
    for matte real-world materials.
    """
    kd = params[..., 0:1]
    sigma = params[..., 1:2]
    s2 = sigma * sigma
    a_coef = 1.0 - 0.5 * s2 / (s2 + 0.33)
    b_coef = 0.45 * s2 / (s2 + 0.09)

    nl = jnp.clip(angles.cos_ln, -1.0, 1.0)
    nv = jnp.clip(angles.cos_vn, -1.0, 1.0)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - nl * nl, 0.0))
    sin_r = jnp.sqrt(jnp.maximum(1.0 - nv * nv, 0.0))
    lv = _lv_from_angles(angles)
    cos_phi = (lv - nl * nv) / jnp.maximum(sin_i * sin_r, _EPS)
    cos_phi = jnp.clip(cos_phi, -1.0, 1.0)

    cos_alpha = jnp.minimum(nl, nv)              # larger angle = smaller cos
    cos_beta = jnp.maximum(nl, nv)
    sin_alpha = jnp.sqrt(jnp.maximum(1.0 - cos_alpha * cos_alpha, 0.0))
    tan_beta = jnp.sqrt(jnp.maximum(1.0 - cos_beta * cos_beta, 0.0)) / jnp.maximum(
        cos_beta, _EPS
    )
    term = a_coef + b_coef * jnp.maximum(cos_phi, 0.0) * sin_alpha * tan_beta
    return kd / jnp.pi * jnp.maximum(nl, 0.0) * term


def ward(params: jnp.ndarray, angles: ShadingAngles) -> jnp.ndarray:
    """Isotropic Ward gloss (Walter's normalization), params ``(kd, ks, alpha)``:

    ``I = kd/π·⟨N·L⟩ + ks·√(⟨N·L⟩/⟨N·V⟩)·exp(−tan²δ/α²)/(4πα²)``

    with δ the half-vector/normal angle, so ``tan²δ = (1−cosNH²)/cosNH²``
    comes straight from the existing angle channels. Extension lobe (brushed
    metals / glossy paints); no reference counterpart.
    """
    kd = params[..., 0:1]
    ks = params[..., 1:2]
    alpha = jnp.maximum(params[..., 2:3], 1e-3)
    a2 = alpha * alpha

    nl = jnp.maximum(angles.cos_ln, 0.0)
    nv = jnp.maximum(angles.cos_vn, _EPS)
    # both-sides horizon mask: √(nl/nv) and tan²δ diverge as the light/view
    # goes back-facing. Double-where keeps autodiff finite: √'s infinite slope
    # at nl=0 and d(tan²)/dnh = −2/nh³ at clamped nh must not leak NaN/overflow
    # through the masked branch (−1/nh⁴ overflows f32 below nh≈1e-10).
    lit = (angles.cos_ln > 0) & (angles.cos_nh > 0) & (angles.cos_vn > 0)
    nh = jnp.maximum(jnp.where(lit, angles.cos_nh, 1.0), 1e-4)
    tan2 = (1.0 - nh * nh) / (nh * nh)
    lobe = jnp.exp(-tan2 / a2) / (4.0 * jnp.pi * a2)
    rt = jnp.sqrt(jnp.where(lit, nl, 1.0) / nv)
    spec = ks * jnp.where(lit, rt * lobe, 0.0)
    return kd / jnp.pi * nl + spec


def minnaert(params: jnp.ndarray, angles: ShadingAngles) -> jnp.ndarray:
    """Minnaert limb-darkening diffuse ``I = kd·⟨N·L⟩ᵏ·⟨N·V⟩^(k−1)``,
    params ``(kd, k)`` (k=1 reduces to Lambert·π). Classic lunar/velvet
    model; extension lobe, no reference counterpart."""
    kd = params[..., 0:1]
    k = params[..., 1:2]
    nl = jnp.maximum(angles.cos_ln, 0.0)
    nv = jnp.maximum(angles.cos_vn, _EPS)
    # back-facing views masked: nv^(k−1) with k<1 diverges at the eps clamp
    lit = (angles.cos_ln > 0) & (angles.cos_vn > 0)
    return kd * _safe_pow(nl, k) * _safe_pow(nv, k - 1.0) * lit


def _rotated_tangent_components(params_phi: jnp.ndarray, ct, cb):
    """Rotate tangent-frame components (·T, ·B) by the lobe's in-plane
    orientation φ: components along the material's principal axes."""
    c = jnp.cos(params_phi)
    s = jnp.sin(params_phi)
    return c * ct + s * cb, -s * ct + c * cb


def _require_tangent(angles: ShadingAngles, model: str) -> None:
    if angles.cos_th is None:
        raise ValueError(
            f"model {model!r} needs tangent-frame angle channels; build the "
            "angles with shading_angles(..., tangent_frame=True) or "
            "angles_from_geometry(geom, tangent_frame=True)"
        )


def ward_aniso(params: jnp.ndarray, angles: ShadingAngles) -> jnp.ndarray:
    """Anisotropic Ward gloss (Walter's normalization), params
    ``(kd, ks, alpha_x, alpha_y, phi)``:

    ``I = kd/π·⟨N·L⟩ + ks·√(⟨N·L⟩/⟨N·V⟩)·exp(−(hₜ²/αₓ² + h_b²/α_y²)/h_n²)/(4π αₓ α_y)``

    with ``(hₜ, h_b)`` the half vector's components along the material's
    principal axes — the canonical per-normal tangent frame rotated in-plane
    by ``phi`` (so the anisotropy orientation is itself a fitted parameter;
    period π). ``alpha_x = alpha_y`` reduces exactly to :func:`ward`.
    Extension lobe (brushed metal / satin); no reference counterpart.
    """
    _require_tangent(angles, "ward_aniso")
    kd = params[..., 0:1]
    ks = params[..., 1:2]
    ax = jnp.maximum(params[..., 2:3], 1e-3)
    ay = jnp.maximum(params[..., 3:4], 1e-3)
    phi = params[..., 4:5]

    nl = jnp.maximum(angles.cos_ln, 0.0)
    nv = jnp.maximum(angles.cos_vn, _EPS)
    lit = (angles.cos_ln > 0) & (angles.cos_nh > 0) & (angles.cos_vn > 0)
    nh = jnp.maximum(jnp.where(lit, angles.cos_nh, 1.0), 1e-4)
    ht, hb = _rotated_tangent_components(phi, angles.cos_th, angles.cos_bh)
    # tan²δ decomposed on the principal axes: (ht²/ax² + hb²/ay²)/nh².
    # Masked components keep autodiff finite exactly like the isotropic lobe
    # (−2/nh³ slope at the clamp must not leak through the dead branch).
    ht = jnp.where(lit, ht, 0.0)
    hb = jnp.where(lit, hb, 0.0)
    expo = ((ht / ax) ** 2 + (hb / ay) ** 2) / (nh * nh)
    lobe = jnp.exp(-expo) / (4.0 * jnp.pi * ax * ay)
    rt = jnp.sqrt(jnp.where(lit, nl, 1.0) / nv)
    spec = ks * jnp.where(lit, rt * lobe, 0.0)
    return kd / jnp.pi * nl + spec


def cook_torrance_aniso(params: jnp.ndarray, angles: ShadingAngles) -> jnp.ndarray:
    """Anisotropic Cook-Torrance, params ``(kd, ks, rough_x, rough_y, phi)``:
    anisotropic GGX distribution + height-correlated anisotropic Smith
    visibility (Heitz 2014), with the Disney ``α = roughness²`` remap so that
    ``rough_x = rough_y`` reduces *exactly* to :func:`cook_torrance`.

    ``D = 1/(π αₓ α_y ((hₜ/αₓ)² + (h_b/α_y)² + h_n²)²)``;
    ``V = 0.5/(Λ̂_V + Λ̂_L)`` with
    ``Λ̂_V = ⟨N·L⟩·√(αₓ² vₜ² + α_y² v_b² + ⟨N·V⟩²)`` (and symmetrically for L).
    ``phi`` rotates the principal axes in the canonical tangent plane
    (period π). The specular term is strictly horizon-masked
    (``N·L, N·V, N·H > 0``): the tangent-plane decomposition only equals the
    isotropic form on the physical domain (unit-vector identity
    ``t² + b² + n² = 1`` breaks once a cosine is clamped), and back-facing
    view/half configurations carry no radiometric meaning anyway — the
    isotropic lobe's clamped evaluation there is a legacy of its
    cosine-only parameterization, not physics. Extension lobe; no reference
    counterpart.
    """
    _require_tangent(angles, "cook_torrance_aniso")
    kd = params[..., 0:1]
    ks = params[..., 1:2]
    ax = jnp.maximum(params[..., 2:3], 1e-3) ** 2     # Disney remap α = r²
    ay = jnp.maximum(params[..., 3:4], 1e-3) ** 2
    phi = params[..., 4:5]

    lit = (angles.cos_ln > 0) & (angles.cos_vn > 0) & (angles.cos_nh > 0)
    nl = jnp.maximum(angles.cos_ln, 0.0)
    nv = jnp.where(lit, jnp.maximum(angles.cos_vn, _EPS), 1.0)
    nh = jnp.where(lit, angles.cos_nh, 1.0)
    # dead-branch components zeroed so no masked-region gradients leak
    ht, hb = _rotated_tangent_components(phi, angles.cos_th, angles.cos_bh)
    lt, lb = _rotated_tangent_components(phi, angles.cos_tl, angles.cos_bl)
    vt, vb = _rotated_tangent_components(phi, angles.cos_tv, angles.cos_bv)
    ht = jnp.where(lit, ht, 0.0)
    hb = jnp.where(lit, hb, 0.0)
    lt = jnp.where(lit, lt, 0.0)
    lb = jnp.where(lit, lb, 0.0)
    vt = jnp.where(lit, vt, 0.0)
    vb = jnp.where(lit, vb, 0.0)

    # anisotropic GGX NDF
    d_denom = (ht / ax) ** 2 + (hb / ay) ** 2 + nh * nh
    d = 1.0 / jnp.maximum(jnp.pi * ax * ay * d_denom * d_denom, _EPS)

    # height-correlated anisotropic Smith visibility (G2 / (4 nl nv)).
    # nl is kept at 1 inside the dead-branch sqrt: with the masked tangent
    # components zeroed, the argument would be exactly 0 there and sqrt's
    # infinite slope at 0 would leak NaN through the 0·∞ of the mask.
    nl_s = jnp.where(lit, nl, 1.0)
    lam_v = nl * jnp.sqrt((ax * vt) ** 2 + (ay * vb) ** 2 + nv * nv)
    lam_l = nv * jnp.sqrt((ax * lt) ** 2 + (ay * lb) ** 2 + nl_s * nl_s)
    vis = 0.5 / jnp.maximum(lam_v + lam_l, _EPS)

    spec = ks * d * vis * nl
    diff = kd / jnp.pi * nl
    return diff + jnp.where(lit, spec, 0.0)


class ModelSpec(NamedTuple):
    name: str
    n_params: int
    fn: Callable[[jnp.ndarray, ShadingAngles], jnp.ndarray]
    param_names: tuple[str, ...]
    p0: tuple[float, ...]       # default starting point (reference used
                                # {0.5, 1, 1}, brdfdata.cpp:1085)
    lower: tuple[float, ...]    # default box (reference: [0,100]³,
    upper: tuple[float, ...]    # brdfdata.cpp:1115-1117)
    linear: int = 2             # leading params the lobe is linear in
                                # (drives solver/init.py's closed-form NNLS)
    tangent: bool = False       # needs tangent-frame angle channels
                                # (shading_angles(..., tangent_frame=True))


MODELS: dict[str, ModelSpec] = {
    "phong": ModelSpec(
        "phong", 3, phong, ("kd", "ks", "n"),
        (0.5, 1.0, 1.0), (0.0, 0.0, 0.0), (100.0, 100.0, 100.0),
    ),
    "blinn_phong": ModelSpec(
        "blinn_phong", 3, blinn_phong, ("kd", "ks", "n"),
        (0.5, 1.0, 1.0), (0.0, 0.0, 0.0), (100.0, 100.0, 100.0),
    ),
    "cook_torrance": ModelSpec(
        "cook_torrance", 3, cook_torrance, ("kd", "ks", "roughness"),
        (0.5, 0.5, 0.5), (0.0, 0.0, 1e-3), (100.0, 100.0, 1.0),
    ),
    "cook_torrance_fresnel": ModelSpec(
        "cook_torrance_fresnel", 4, cook_torrance_fresnel,
        ("kd", "ks", "roughness", "f0"),
        (0.5, 0.5, 0.5, 0.5), (0.0, 0.0, 1e-3, 0.0), (100.0, 100.0, 1.0, 1.0),
    ),
    "lambert": ModelSpec(
        "lambert", 1, lambert, ("kd",),
        (0.5,), (0.0,), (100.0,), linear=1,
    ),
    "oren_nayar": ModelSpec(
        "oren_nayar", 2, oren_nayar, ("kd", "sigma"),
        (0.5, 0.3), (0.0, 0.0), (100.0, 1.5), linear=1,
    ),
    "ward": ModelSpec(
        "ward", 3, ward, ("kd", "ks", "alpha"),
        (0.5, 0.5, 0.3), (0.0, 0.0, 1e-3), (100.0, 100.0, 1.0),
    ),
    "minnaert": ModelSpec(
        "minnaert", 2, minnaert, ("kd", "k"),
        (0.5, 1.0), (0.0, 0.3), (100.0, 3.0), linear=1,
    ),
    # anisotropic extension lobes: the orientation phi has period π; the box
    # is one full period wide around 0 so fits near either symmetry axis are
    # never pinned at a bound.
    "ward_aniso": ModelSpec(
        "ward_aniso", 5, ward_aniso, ("kd", "ks", "alpha_x", "alpha_y", "phi"),
        (0.5, 0.5, 0.3, 0.3, 0.0),
        (0.0, 0.0, 1e-3, 1e-3, -math.pi / 2),
        (100.0, 100.0, 1.0, 1.0, math.pi / 2),
        tangent=True,
    ),
    "cook_torrance_aniso": ModelSpec(
        "cook_torrance_aniso", 5, cook_torrance_aniso,
        ("kd", "ks", "rough_x", "rough_y", "phi"),
        (0.5, 0.5, 0.5, 0.5, 0.0),
        (0.0, 0.0, 1e-3, 1e-3, -math.pi / 2),
        (100.0, 100.0, 1.0, 1.0, math.pi / 2),
        tangent=True,
    ),
}


def brdf_eval(model: str, params: jnp.ndarray, angles: ShadingAngles) -> jnp.ndarray:
    """Evaluate a registered model by name."""
    return MODELS[model].fn(params, angles)
