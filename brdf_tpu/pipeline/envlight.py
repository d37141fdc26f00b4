"""Image-based (environment-map) relighting.

The reference could only re-shade under its 16-LED rig or a headlight at the
eye (``/root/reference/glutcallbacks.cpp:346-445``); this module relights
fitted BRDF maps under arbitrary lat-long HDR environments — the natural
"serve" extension once per-texel materials exist.

Two integration paths, both device-friendly:

- **Sampled specular/general**: the environment is converted host-side (pure
  NumPy, per the project's TPU-access discipline) into N directional lights
  with RGB radiance weights — luminance-importance sampled (deterministic
  systematic resampling) or uniform Fibonacci-sphere quadrature — and shaded
  through the registered lobes in one jitted program. Any registry model
  works, including the anisotropic ones.
- **SH9 diffuse irradiance**: the classic Ramamoorthi-Hanrahan 9-coefficient
  irradiance map; exact for Lambertian response up to SH band 2, evaluated in
  closed form per normal. Used for fast diffuse-only relights and as the
  analytic cross-check of the sampled path in tests.

Lat-long convention: rows are the polar angle θ ∈ [0, π] measured from +Y
(y-up), columns the azimuth φ ∈ [0, 2π) with direction
``(sinθ·cosφ, cosθ, sinθ·sinφ)``; a pixel subtends Δω = (2π/W)(π/H)·sinθ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from brdf_tpu.models.brdf import (
    MODELS,
    ShadingGeometry,
    angles_from_geometry,
    _normalize,
)


def latlong_directions(height: int, width: int) -> np.ndarray:
    """(H, W, 3) unit direction of each lat-long pixel center (y-up)."""
    theta = (np.arange(height) + 0.5) * np.pi / height
    phi = (np.arange(width) + 0.5) * 2.0 * np.pi / width
    st, ct = np.sin(theta)[:, None], np.cos(theta)[:, None]
    return np.stack(
        [st * np.cos(phi)[None, :], np.broadcast_to(ct, (height, width)),
         st * np.sin(phi)[None, :]],
        axis=-1,
    )


def latlong_solid_angles(height: int, width: int) -> np.ndarray:
    """(H, W) solid angle of each pixel; sums to exactly 4π.

    Uses the exact per-row integral ∫sinθ dθ = cosθ₀ − cosθ₁ over each
    pixel's polar band (not the midpoint value), so total energy is
    conserved at any resolution."""
    edges = np.arange(height + 1) * np.pi / height
    band = np.cos(edges[:-1]) - np.cos(edges[1:])        # (H,), sums to 2
    return np.broadcast_to(
        (band * (2.0 * np.pi / width))[:, None], (height, width)
    ).copy()


def _luminance(rgb: np.ndarray) -> np.ndarray:
    return rgb @ np.asarray([0.2126, 0.7152, 0.0722], rgb.dtype)


def env_to_lights(
    env: np.ndarray,            # (H, W, C) linear radiance, lat-long
    n: int = 256,
    method: str = "importance",  # "importance" | "uniform"
) -> tuple[np.ndarray, np.ndarray]:
    """Convert an environment map into ``n`` directional lights.

    Returns ``(dirs (n, 3), radiance (n, C))`` such that
    ``Σ_s radiance_s · brdf(ω_s)·cosθ_s`` estimates the true environment
    integral ``∫ L(ω)·brdf(ω)·cosθ dω``. Host-side pure NumPy.

    ``importance`` draws pixels ∝ luminance·Δω with *systematic* resampling
    (deterministic: no RNG, stratified offsets), weighting each sample by
    ``W_tot/(n·lum_s)·L_s`` — low variance for peaked HDR skies.
    ``uniform`` places a Fibonacci sphere and weights by ``L(ω_s)·4π/n``
    (bilinear lookup) — robust for smooth environments and exact-quadrature
    tests.
    """
    env = np.asarray(env, np.float64)
    if env.ndim == 2:
        env = env[..., None]
    h, w, c = env.shape
    if method == "importance":
        dirs_all = latlong_directions(h, w).reshape(-1, 3)
        dw = latlong_solid_angles(h, w).reshape(-1)
        lum = np.maximum(_luminance(env.reshape(-1, c)), 0.0)
        wgt = lum * dw
        total = wgt.sum()
        if total <= 0:
            raise ValueError("environment map has no positive luminance")
        # systematic (stratified) resampling: deterministic, O(HW)
        cdf = np.cumsum(wgt) / total
        u = (np.arange(n) + 0.5) / n
        idx = np.searchsorted(cdf, u)
        rad = (total / n) * env.reshape(-1, c)[idx] / lum[idx, None]
        return dirs_all[idx].astype(np.float32), rad.astype(np.float32)
    if method == "uniform":
        # Fibonacci sphere: near-uniform deterministic quadrature
        i = np.arange(n) + 0.5
        y = 1.0 - 2.0 * i / n
        r = np.sqrt(np.maximum(1.0 - y * y, 0.0))
        ga = np.pi * (3.0 - np.sqrt(5.0))
        dirs = np.stack([r * np.cos(ga * i), y, r * np.sin(ga * i)], axis=-1)
        rad = lookup_latlong(env, dirs) * (4.0 * np.pi / n)
        return dirs.astype(np.float32), rad.astype(np.float32)
    raise ValueError(f"unknown sampling method {method!r} (importance | uniform)")


def lookup_latlong(env: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """Bilinear lat-long lookup of unit ``dirs`` (..., 3) → (..., C).
    Azimuth wraps; polar clamps (host-side NumPy)."""
    env = np.asarray(env, np.float64)
    h, w, c = env.shape
    d = np.asarray(dirs, np.float64)
    theta = np.arccos(np.clip(d[..., 1], -1.0, 1.0))
    phi = np.arctan2(d[..., 2], d[..., 0]) % (2.0 * np.pi)
    fy = theta * h / np.pi - 0.5
    fx = phi * w / (2.0 * np.pi) - 0.5
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    ty = (fy - y0)[..., None]
    tx = (fx - x0)[..., None]
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    x0w = x0 % w
    x1w = (x0 + 1) % w
    v00 = env[y0c, x0w]
    v01 = env[y0c, x1w]
    v10 = env[y1c, x0w]
    v11 = env[y1c, x1w]
    return (1 - ty) * ((1 - tx) * v00 + tx * v01) + ty * ((1 - tx) * v10 + tx * v11)


# ---------------------------------------------------------------------------
# SH9 irradiance (Ramamoorthi & Hanrahan 2001)
# ---------------------------------------------------------------------------

_SH_C = np.asarray(
    [0.282095,                      # Y00
     0.488603, 0.488603, 0.488603,  # Y1-1 (y), Y10 (z), Y11 (x)
     1.092548, 1.092548,            # Y2-2 (xy), Y2-1 (yz)
     0.315392,                      # Y20 (3z²−1)
     1.092548, 0.546274]            # Y21 (xz), Y22 (x²−y²)
)
# clamped-cosine convolution coefficients Â_l = (π, 2π/3, π/4)
_SH_A = np.asarray(
    [np.pi,
     2 * np.pi / 3, 2 * np.pi / 3, 2 * np.pi / 3,
     np.pi / 4, np.pi / 4, np.pi / 4, np.pi / 4, np.pi / 4]
)


def _sh9_basis(d):
    """Evaluate the 9 real SH basis functions at unit dirs (..., 3) → (..., 9).
    Works for NumPy and jnp inputs (pure ufunc math)."""
    xp = jnp if isinstance(d, jnp.ndarray) else np
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    c = _SH_C if xp is np else jnp.asarray(_SH_C, d.dtype)
    return xp.stack(
        [
            c[0] * xp.ones_like(x),
            c[1] * y, c[2] * z, c[3] * x,
            c[4] * x * y, c[5] * y * z,
            c[6] * (3 * z * z - 1.0),
            c[7] * x * z, c[8] * (x * x - y * y),
        ],
        axis=-1,
    )


def sh9_project(env: np.ndarray) -> np.ndarray:
    """Project a lat-long environment onto the first 9 SH coefficients:
    ``L_lm = Σ_pixels L(ω)·Y_lm(ω)·Δω``. Returns (9, C). Host-side."""
    env = np.asarray(env, np.float64)
    if env.ndim == 2:
        env = env[..., None]
    h, w, c = env.shape
    dirs = latlong_directions(h, w).reshape(-1, 3)
    dw = latlong_solid_angles(h, w).reshape(-1)
    basis = _sh9_basis(dirs)                           # (HW, 9)
    return np.einsum("pk,p,pc->kc", basis, dw, env.reshape(-1, c))


def sh9_irradiance(normals, coeffs) -> jnp.ndarray:
    """Diffuse irradiance ``E(n) = Σ Â_l L_lm Y_lm(n)`` per normal:
    (..., 3) × (9, C) → (..., C). jnp; jit/vmap friendly."""
    basis = _sh9_basis(jnp.asarray(normals))           # (..., 9)
    a = jnp.asarray(_SH_A, basis.dtype)
    return jnp.einsum("...k,kc->...c", basis * a, jnp.asarray(coeffs, basis.dtype))


# ---------------------------------------------------------------------------
# Shading under directional environment samples
# ---------------------------------------------------------------------------


def directional_angles(normals, points, eye, dirs, tangent_frame: bool = False):
    """Shading angles for *directional* lights: L is the (constant) sample
    direction instead of a normalized texel→LED vector."""
    l = jnp.broadcast_to(
        jnp.asarray(dirs)[None, :, :], (normals.shape[0],) + jnp.shape(dirs)
    )
    if jnp.ndim(eye) == 1:
        v = _normalize(eye - points)[..., None, :]
    else:
        v = _normalize(eye - points[..., None, :])
    v = jnp.broadcast_to(v, l.shape)
    geom = ShadingGeometry(n=jnp.asarray(normals), l=l, v=v)
    return angles_from_geometry(geom, tangent_frame=tangent_frame)


@functools.partial(jax.jit, static_argnames=("model",))
def shade_env_samples(
    model: str,
    params: jnp.ndarray,    # (N, C, m) per-texel per-channel parameters
    points: jnp.ndarray,    # (N, 3)
    normals: jnp.ndarray,   # (N, 3)
    eye: jnp.ndarray,       # (3,)
    dirs: jnp.ndarray,      # (S, 3) environment sample directions
    radiance: jnp.ndarray,  # (S, C) per-sample RGB radiance·Δω weights
) -> jnp.ndarray:
    """Shade N surface samples under S directional environment samples;
    returns (N, C). One fused XLA program — the IBL serve path."""
    spec = MODELS[model]
    ang = directional_angles(
        normals, points, eye, dirs, tangent_frame=spec.tangent
    )
    # params (N, C, m) × angles (N, 1, S) → (N, C, S); weight and sum samples
    vals = spec.fn(params, jax.tree.map(lambda a: a[:, None, :], ang))
    return jnp.einsum("ncs,sc->nc", vals, jnp.asarray(radiance, vals.dtype))


def relight_env(
    model: str,
    scene,
    params: np.ndarray,
    face_ids: np.ndarray,
    env: np.ndarray,
    view: int = 0,
    n_samples: int = 256,
    method: str = "importance",
    background: float = 0.0,
    use_vertex_normals: bool = True,
) -> np.ndarray:
    """Render one camera view of the fitted scene under an environment map —
    the IBL counterpart of :func:`brdf_tpu.pipeline.render.relight`."""
    from brdf_tpu.pipeline.render import gather_covered_pixels

    dirs, rad = env_to_lights(env, n=n_samples, method=method)
    rm = scene.raster_map(view)
    cam = scene.cameras[view]

    cov, pts, nrm, p_px, valid = gather_covered_pixels(
        scene.mesh, rm, params, face_ids, use_vertex_normals=use_vertex_normals
    )

    c = params.shape[1]
    if rad.shape[1] == 1 and c > 1:
        rad = np.repeat(rad, c, axis=1)
    shaded = shade_env_samples(
        model,
        jnp.asarray(p_px),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(nrm, jnp.float32),
        cam.position,
        jnp.asarray(dirs, jnp.float32),
        jnp.asarray(rad[:, :c], jnp.float32),
    )
    img = np.full((cam.height, cam.width, c), background, np.float32)
    img[cov] = np.asarray(shaded) * valid[:, None]
    return img
