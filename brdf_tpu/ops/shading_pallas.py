"""Pallas TPU shading kernel with hand-derived analytic backward.

The BASELINE north star asks for "the shading kernel and its analytic
backward written in Pallas" — this module is that kernel, the TPU-native
replacement for the reference's shading evaluation both in the fit residual
(``BRDFFunc``, ``/root/reference/brdfdata.cpp:969-989``) and in the preview
renderer's per-triangle CPU loop (``glutcallbacks.cpp:344-446``).

Design (mirrors ``ops/lm_pallas.py``'s layout conventions):

- **Views-major (V, T) layout**: texels ride the 128-wide lane axis, views the
  sublane axis, so the whole lobe evaluation is dense VPU work with no
  reductions in the kernel at all (the loss/reduction composes outside).
- **Analytic VJP**: the backward kernel recomputes the forward pieces in VMEM
  (cheaper than storing V×T intermediates to HBM — the classic
  rematerialisation trade) and contracts the hand-derived partials with the
  incoming cotangent in one pass: parameter cotangents are an over-views
  reduction, angle cotangents are elementwise. One fused kernel emits both.
- **``jax.custom_vjp`` wiring**: ``shade_pallas`` differentiates like any JAX
  function — ``jax.grad`` through it reaches per-texel parameters *and* the
  shading angles, so it drops into both the plain per-texel fit and the joint
  normal-map fit (where gradients must flow through the angles into the
  normal offsets).

Every partial derivative matches the jnp models in ``models/brdf.py``
(including their clamp/mask subgradient conventions), which tests verify
against ``jax.vjp`` of the jnp model in float32 and against float64.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from brdf_tpu.models.brdf import ShadingAngles

_EPS = 1e-12


class ShadingKernelSpec(NamedTuple):
    name: str
    n_params: int
    angle_names: tuple[str, ...]
    # eval(angles: tuple[(V,T)], params: tuple[(1,T)])
    #   -> (I (V,T), d_params tuple[(V,T)], d_angles tuple[(V,T)])
    # d_params[j] = ∂I/∂params[j] (per view; caller reduces over views),
    # d_angles[a] = ∂I/∂angles[a].
    eval: Callable


# ---------------------------------------------------------------------------
# Analytic forward+partials per lobe (all match models/brdf.py semantics)
# ---------------------------------------------------------------------------


def _blinn_phong_full(angles, params):
    cl, cnh = angles
    kd, ks, n = params
    lit = cl > 0
    diff_b = jnp.maximum(cl, 0.0)
    s = jnp.maximum(cnh, _EPS)
    ln_s = jnp.log(s)
    m = lit & (cnh > 0)
    pw = jnp.where(m, jnp.exp(n * ln_s), 0.0)
    pw_m1 = jnp.where(m, jnp.exp((n - 1.0) * ln_s), 0.0)
    i_val = kd * diff_b + ks * pw
    d_kd = diff_b
    d_ks = pw
    d_n = ks * ln_s * pw
    d_cl = kd * lit.astype(cl.dtype)
    d_cnh = ks * n * pw_m1
    return i_val, (d_kd, d_ks, d_n), (d_cl, d_cnh)


def _phong_full(angles, params):
    cl, crv = angles
    kd, ks, n = params
    lit = cl > 0
    diff_b = jnp.maximum(cl, 0.0)
    s = jnp.maximum(crv, _EPS)
    ln_s = jnp.log(s)
    m = lit & (crv > 0)
    pw = jnp.where(m, jnp.exp(n * ln_s), 0.0)
    pw_m1 = jnp.where(m, jnp.exp((n - 1.0) * ln_s), 0.0)
    two_pi = 2.0 * jnp.pi
    norm = (n + 2.0) / two_pi
    i_val = kd * diff_b + ks * norm * pw
    d_kd = diff_b
    d_ks = norm * pw
    d_n = ks * (pw / two_pi + norm * ln_s * pw)
    d_cl = kd * lit.astype(cl.dtype)
    d_crv = ks * norm * n * pw_m1
    return i_val, (d_kd, d_ks, d_n), (d_cl, d_crv)


def _ct_core(cl, cnh, cvn, ks, rough):
    """Cook-Torrance specular core ``S = ks·D·vis·nl·[nl>0]`` and its partials
    w.r.t. (ks, rough, cl, cnh, cvn). Shared by the plain and Fresnel lobes.

    Matches ``models/brdf.py::cook_torrance`` clamp-for-clamp: ``nl=max(cl,0)``,
    ``nv=max(cvn,eps)``, ``nh=max(cnh,0)``, ``r=max(rough,1e-3)``, ``a2=r⁴``,
    GGX ``D=a2/max(π u², eps)`` with ``u=nh²(a2−1)+1``, height-correlated Smith
    ``vis=0.5/max(Λv+Λl, eps)``.
    """
    nl = jnp.maximum(cl, 0.0)
    nv = jnp.maximum(cvn, _EPS)
    nh = jnp.maximum(cnh, 0.0)
    r = jnp.maximum(rough, 1e-3)
    r2 = r * r
    a2 = r2 * r2

    u = nh * nh * (a2 - 1.0) + 1.0
    du = jnp.pi * u * u
    d_clamped = du <= _EPS                      # D's denominator clamp active?
    du_s = jnp.maximum(du, _EPS)
    d = a2 / du_s
    # When the clamp is active the denominator chain has zero subgradient but
    # the numerator path (∂/∂a2 of a2/eps = 1/eps) stays live — exactly what
    # autodiff of the jnp model yields. inv_u is guarded so the dead branch
    # cannot manufacture inf·0 NaNs (u ≥ a2·nh² can approach 0 at grazing nh).
    inv_u = jnp.where(d_clamped, 0.0, 1.0 / jnp.maximum(u, _EPS))
    dd_da2 = 1.0 / du_s - 2.0 * a2 * nh * nh * inv_u / du_s
    dd_dnh = -(2.0 * a2 * inv_u / du_s) * 2.0 * nh * (a2 - 1.0)

    sv = jnp.sqrt(nv * nv * (1.0 - a2) + a2)
    sl = jnp.sqrt(nl * nl * (1.0 - a2) + a2)
    den_raw = nl * sv + nv * sl
    v_clamped = den_raw <= _EPS
    den = jnp.maximum(den_raw, _EPS)
    vis = 0.5 / den
    live_v = 1.0 - v_clamped.astype(cl.dtype)
    dden = -0.5 / (den * den) * live_v          # dvis/dden
    sv_s = jnp.maximum(sv, _EPS)
    sl_s = jnp.maximum(sl, _EPS)
    dvis_dnl = dden * (sv + nv * nl * (1.0 - a2) / sl_s)
    dvis_dnv = dden * (nl * nv * (1.0 - a2) / sv_s + sl)
    dvis_da2 = dden * (nl * (1.0 - nv * nv) / (2.0 * sv_s)
                       + nv * (1.0 - nl * nl) / (2.0 * sl_s))

    lit = (nl > 0).astype(cl.dtype)
    core = d * vis * nl * lit                   # S/ks
    s_val = ks * core

    da2_dr = 4.0 * r2 * r
    live_r = (rough > 1e-3).astype(cl.dtype)    # r-clamp subgradient
    ds_drough = ks * (dd_da2 * vis + d * dvis_da2) * nl * lit * da2_dr * live_r
    ds_dcl = ks * (d * (vis + nl * dvis_dnl)) * lit * (cl > 0).astype(cl.dtype)
    ds_dcnh = ks * dd_dnh * vis * nl * lit * (cnh > 0).astype(cl.dtype)
    ds_dcvn = ks * d * nl * dvis_dnv * lit * (cvn > _EPS).astype(cl.dtype)
    return s_val, core, nl, ds_drough, ds_dcl, ds_dcnh, ds_dcvn


def _cook_torrance_full(angles, params):
    cl, cnh, cvn = angles
    kd, ks, rough = params
    s_val, core, nl, ds_dr, ds_dcl, ds_dcnh, ds_dcvn = _ct_core(cl, cnh, cvn, ks, rough)
    inv_pi = 1.0 / jnp.pi
    i_val = kd * inv_pi * nl + s_val
    d_kd = inv_pi * nl
    d_cl = kd * inv_pi * (cl > 0).astype(cl.dtype) + ds_dcl
    return i_val, (d_kd, core, ds_dr), (d_cl, ds_dcnh, ds_dcvn)


def _cook_torrance_fresnel_full(angles, params):
    cl, cnh, cvn, crv = angles
    kd, ks, rough, f0 = params
    s_val, core, nl, ds_dr, ds_dcl, ds_dcnh, ds_dcvn = _ct_core(cl, cnh, cvn, ks, rough)

    # Schlick Fresnel on the half-angle: L·V = 2(N·L)(N·V) − R·V (raw angles,
    # matching models/brdf.py::_lv_from_angles), vh = √max((1+L·V)/2, eps)
    lv = 2.0 * cl * cvn - crv
    half_raw = (1.0 + lv) / 2.0
    half = jnp.maximum(half_raw, _EPS)
    vh = jnp.sqrt(half)
    b = 1.0 - vh
    mb = b > 0
    b_s = jnp.maximum(b, _EPS)
    u5 = jnp.where(mb, b_s ** 5, 0.0)
    u4 = jnp.where(mb, b_s ** 4, 0.0)
    fres = f0 + (1.0 - f0) * u5
    # dF/dlv = (1−f0)·5(1−vh)⁴·(−dvh/dlv), dvh/dlv = 1/(4 vh) (when unclamped)
    live_h = (half_raw > _EPS).astype(cl.dtype)
    df_dlv = -(1.0 - f0) * 5.0 * u4 / (4.0 * vh) * live_h

    inv_pi = 1.0 / jnp.pi
    i_val = kd * inv_pi * nl + fres * s_val
    d_kd = inv_pi * nl
    d_ks = fres * core
    d_rough = fres * ds_dr
    d_f0 = s_val * (1.0 - u5)
    d_cl = kd * inv_pi * (cl > 0).astype(cl.dtype) + fres * ds_dcl \
        + s_val * df_dlv * 2.0 * cvn
    d_cnh = fres * ds_dcnh
    d_cvn = fres * ds_dcvn + s_val * df_dlv * 2.0 * cl
    d_crv = s_val * df_dlv * -1.0
    return i_val, (d_kd, d_ks, d_rough, d_f0), (d_cl, d_cnh, d_cvn, d_crv)


def _lambert_full(angles, params):
    (cl,) = angles
    (kd,) = params
    inv_pi = 1.0 / jnp.pi
    nl = jnp.maximum(cl, 0.0)
    i_val = kd * inv_pi * nl
    return i_val, (inv_pi * nl,), (kd * inv_pi * (cl > 0).astype(cl.dtype),)


def _minnaert_full(angles, params):
    cl, cvn = angles
    kd, k = params
    nl = jnp.maximum(cl, 0.0)
    nv = jnp.maximum(cvn, _EPS)
    lit = ((cl > 0) & (cvn > 0)).astype(cl.dtype)
    nl_s = jnp.maximum(nl, _EPS)
    ln_l = jnp.log(nl_s)
    ln_v = jnp.log(nv)
    ml = cl > 0                       # _safe_pow's base>0 branch selector
    pl = jnp.where(ml, jnp.exp(k * ln_l), 0.0)           # nl^k
    pl_m1 = jnp.where(ml, jnp.exp((k - 1.0) * ln_l), 0.0)
    pv = jnp.exp((k - 1.0) * ln_v)                       # nv^(k−1), nv>0 always
    pv_m1 = jnp.exp((k - 2.0) * ln_v)
    base = pl * pv * lit
    i_val = kd * base
    d_k = kd * base * (ln_l + ln_v)
    d_cl = kd * k * pl_m1 * pv * lit
    d_cvn = kd * pl * (k - 1.0) * pv_m1 * lit * (cvn > _EPS).astype(cl.dtype)
    return i_val, (base, d_k), (d_cl, d_cvn)


def _ward_full(angles, params):
    cl, cnh, cvn = angles
    kd, ks, alpha = params
    nl = jnp.maximum(cl, 0.0)
    nv = jnp.maximum(cvn, _EPS)
    nh = jnp.maximum(cnh, 1e-4)       # floor matches models/brdf.py::ward
    a = jnp.maximum(alpha, 1e-3)
    a2 = a * a
    tan2 = (1.0 - nh * nh) / (nh * nh)
    lobe = jnp.exp(-tan2 / a2) / (4.0 * jnp.pi * a2)
    lit = ((cl > 0) & (cnh > 0) & (cvn > 0)).astype(cl.dtype)
    inv_pi = 1.0 / jnp.pi
    rt = jnp.sqrt(nl / nv)
    spec_b = rt * lobe * lit
    i_val = kd * inv_pi * nl + ks * spec_b
    d_kd = inv_pi * nl
    d_ks = spec_b
    d_a = ks * spec_b * 2.0 * (tan2 - a2) / (a2 * a) * (alpha > 1e-3).astype(cl.dtype)
    # d√(nl/nv)/dnl = 1/(2√(nl·nv)); the nl=0 branch is dead (lit=0 there)
    d_cl = kd * inv_pi * (cl > 0).astype(cl.dtype) \
        + ks * lobe * lit / (2.0 * jnp.sqrt(jnp.maximum(nl * nv, _EPS))) \
        * (cl > 0).astype(cl.dtype)
    # dtan²/dnh = −2/nh³, dlobe/dtan² = −lobe/α²
    d_cnh = ks * rt * lobe * lit * (2.0 / (nh * nh * nh * a2)) \
        * (cnh > 1e-4).astype(cl.dtype)
    d_cvn = ks * lobe * lit * (-0.5) * rt / nv * (cvn > _EPS).astype(cl.dtype)
    return i_val, (d_kd, d_ks, d_a), (d_cl, d_cnh, d_cvn)


def _oren_nayar_full(angles, params):
    cl, cvn, crv = angles
    kd, sigma = params
    s2 = sigma * sigma
    a_coef = 1.0 - 0.5 * s2 / (s2 + 0.33)
    b_coef = 0.45 * s2 / (s2 + 0.09)
    da_ds = -0.33 * sigma / ((s2 + 0.33) ** 2)
    db_ds = 0.081 * sigma / ((s2 + 0.09) ** 2)

    live_l = ((cl > -1.0) & (cl < 1.0)).astype(cl.dtype)   # clip subgradients
    live_v = ((cvn > -1.0) & (cvn < 1.0)).astype(cl.dtype)
    nl = jnp.clip(cl, -1.0, 1.0)
    nv = jnp.clip(cvn, -1.0, 1.0)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - nl * nl, 0.0))
    sin_r = jnp.sqrt(jnp.maximum(1.0 - nv * nv, 0.0))
    dsin_i = -nl / jnp.maximum(sin_i, _EPS) * (sin_i > 0)
    dsin_r = -nv / jnp.maximum(sin_r, _EPS) * (sin_r > 0)

    # L·V = 2 cl·cvn − crv (raw angles, models/brdf.py::_lv_from_angles)
    lv = 2.0 * cl * cvn - crv
    den_raw = sin_i * sin_r
    den = jnp.maximum(den_raw, _EPS)
    live_den = (den_raw > _EPS).astype(cl.dtype)
    cp_raw = (lv - nl * nv) / den
    live_cp = ((cp_raw > -1.0) & (cp_raw < 1.0)).astype(cl.dtype)
    cp = jnp.clip(cp_raw, -1.0, 1.0)
    cpp = jnp.maximum(cp, 0.0)
    live_pos = (cp > 0).astype(cl.dtype)
    # ∂cp/∂(lv, nl, nv) — quotient rule; den's own nl/nv dependence included
    dcp_dlv = live_cp / den * live_den
    dcp_dnl = live_cp * (-nv * den - (lv - nl * nv) * dsin_i * sin_r) / (den * den) \
        * live_den
    dcp_dnv = live_cp * (-nl * den - (lv - nl * nv) * sin_i * dsin_r) / (den * den) \
        * live_den

    cos_a = jnp.minimum(nl, nv)
    cos_b = jnp.maximum(nl, nv)
    pick_l = (nl <= nv).astype(cl.dtype)    # nl is the *larger angle* branch
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
    cos_b_s = jnp.maximum(cos_b, _EPS)
    tan_b = jnp.sqrt(jnp.maximum(1.0 - cos_b * cos_b, 0.0)) / cos_b_s
    s_geo = sin_a * tan_b
    # ∂S/∂cosα = −cosα/sinα·tanβ ; ∂S/∂cosβ = −sinα/(sinβ·cosβ²)
    ds_dca = -cos_a / jnp.maximum(sin_a, _EPS) * (sin_a > 0) * tan_b
    sin_b = jnp.sqrt(jnp.maximum(1.0 - cos_b * cos_b, 0.0))
    ds_dcb = -sin_a / jnp.maximum(sin_b * cos_b_s * cos_b_s, _EPS) * (sin_b > 0) \
        * (cos_b > _EPS).astype(cl.dtype)
    ds_dnl = jnp.where(pick_l > 0, ds_dca, ds_dcb)
    ds_dnv = jnp.where(pick_l > 0, ds_dcb, ds_dca)

    nlp = jnp.maximum(nl, 0.0)
    live_nlp = ((nl > 0).astype(cl.dtype)) * live_l
    inv_pi = 1.0 / jnp.pi
    term = a_coef + b_coef * cpp * s_geo
    base = inv_pi * nlp * term
    i_val = kd * base

    dterm_dnl = b_coef * (live_pos * dcp_dnl * s_geo + cpp * ds_dnl)
    dterm_dnv = b_coef * (live_pos * dcp_dnv * s_geo + cpp * ds_dnv)
    dterm_dlv = b_coef * live_pos * dcp_dlv * s_geo
    # total ∂I/∂cl: through nlp, through nl in (cp, S), and through lv=2·cl·cvn−crv
    d_cl = kd * inv_pi * (
        live_nlp * term
        + nlp * (dterm_dnl * live_l + dterm_dlv * 2.0 * cvn)
    )
    d_cvn = kd * inv_pi * nlp * (dterm_dnv * live_v + dterm_dlv * 2.0 * cl)
    d_crv = kd * inv_pi * nlp * dterm_dlv * -1.0
    d_sigma = kd * inv_pi * nlp * (da_ds + db_ds * cpp * s_geo)
    return i_val, (base, d_sigma), (d_cl, d_cvn, d_crv)


def _ward_aniso_full(angles, params):
    """Anisotropic Ward (``models/brdf.py::ward_aniso``) with hand partials.

    The in-plane orientation φ rotates the tangent-frame half-vector
    components; its own partial uses dht/dφ = hb, dhb/dφ = −ht.
    """
    cl, cnh, cvn, cth, cbh = angles
    kd, ks, p_ax, p_ay, phi = params
    ax = jnp.maximum(p_ax, 1e-3)
    ay = jnp.maximum(p_ay, 1e-3)
    live_ax = (p_ax > 1e-3).astype(cl.dtype)
    live_ay = (p_ay > 1e-3).astype(cl.dtype)

    nl = jnp.maximum(cl, 0.0)
    nv = jnp.maximum(cvn, _EPS)
    litb = (cl > 0) & (cnh > 0) & (cvn > 0)
    lit = litb.astype(cl.dtype)
    nh = jnp.maximum(jnp.where(litb, cnh, 1.0), 1e-4)

    c = jnp.cos(phi)
    s = jnp.sin(phi)
    ht = c * cth + s * cbh
    hb = -s * cth + c * cbh
    ht = jnp.where(litb, ht, 0.0)
    hb = jnp.where(litb, hb, 0.0)

    nh2 = nh * nh
    ax2 = ax * ax
    ay2 = ay * ay
    expo = ((ht * ht) / ax2 + (hb * hb) / ay2) / nh2
    lobe = jnp.exp(-expo) / (4.0 * jnp.pi * ax * ay)
    rt = jnp.sqrt(jnp.where(litb, nl, 1.0) / nv)
    spec_b = rt * lobe * lit

    inv_pi = 1.0 / jnp.pi
    i_val = kd * inv_pi * nl + ks * spec_b

    d_kd = inv_pi * nl
    d_ks = spec_b
    # dlobe/dax = lobe·(2ht²/(ax³ nh²) − 1/ax) (expo and the 1/(4π ax ay) norm)
    d_ax = ks * rt * lobe * lit * (2.0 * ht * ht / (ax2 * ax * nh2) - 1.0 / ax) * live_ax
    d_ay = ks * rt * lobe * lit * (2.0 * hb * hb / (ay2 * ay * nh2) - 1.0 / ay) * live_ay
    dexpo_dphi = 2.0 * ht * hb * (1.0 / ax2 - 1.0 / ay2) / nh2
    d_phi = -ks * rt * lobe * lit * dexpo_dphi

    d_cl = kd * inv_pi * (cl > 0).astype(cl.dtype) \
        + ks * lobe * lit / (2.0 * jnp.sqrt(jnp.maximum(nl * nv, _EPS))) \
        * (cl > 0).astype(cl.dtype)
    # expo = K/nh² with K nh-independent ⇒ dexpo/dnh = −2·expo/nh
    d_cnh = ks * rt * lobe * lit * (2.0 * expo / nh) * (cnh > 1e-4).astype(cl.dtype)
    d_cvn = ks * lobe * lit * (-0.5) * rt / nv * (cvn > _EPS).astype(cl.dtype)
    d_cth = -ks * rt * lobe * lit * (2.0 * ht * c / ax2 - 2.0 * hb * s / ay2) / nh2
    d_cbh = -ks * rt * lobe * lit * (2.0 * ht * s / ax2 + 2.0 * hb * c / ay2) / nh2
    return (
        i_val,
        (d_kd, d_ks, d_ax, d_ay, d_phi),
        (d_cl, d_cnh, d_cvn, d_cth, d_cbh),
    )


def _cook_torrance_aniso_full(angles, params):
    """Anisotropic GGX Cook-Torrance (``models/brdf.py::cook_torrance_aniso``)
    with hand partials: Disney remap α = r², anisotropic NDF
    ``D = 1/(π αₓ α_y u²)`` with ``u = (hₜ/αₓ)² + (h_b/α_y)² + h_n²``, and
    height-correlated anisotropic Smith visibility. All tangent-frame
    components are rotated by the fitted orientation φ (dX_t/dφ = X_b,
    dX_b/dφ = −X_t for each of H, L, V).
    """
    cl, cnh, cvn, cth, cbh, ctl, cbl, ctv, cbv = angles
    kd, ks, p_rx, p_ry, phi = params
    rx = jnp.maximum(p_rx, 1e-3)
    ry = jnp.maximum(p_ry, 1e-3)
    a = rx * rx                                   # α_x (Disney remap)
    b = ry * ry
    live_rx = (p_rx > 1e-3).astype(cl.dtype)
    live_ry = (p_ry > 1e-3).astype(cl.dtype)

    litb = (cl > 0) & (cvn > 0) & (cnh > 0)
    lit = litb.astype(cl.dtype)
    nl = jnp.maximum(cl, 0.0)
    nv = jnp.where(litb, jnp.maximum(cvn, _EPS), 1.0)
    nh = jnp.where(litb, cnh, 1.0)
    nl_s = jnp.where(litb, nl, 1.0)

    c = jnp.cos(phi)
    s = jnp.sin(phi)

    def rot(t_c, b_c):
        tr = c * t_c + s * b_c
        br = -s * t_c + c * b_c
        return jnp.where(litb, tr, 0.0), jnp.where(litb, br, 0.0)

    ht, hb = rot(cth, cbh)
    lt, lb = rot(ctl, cbl)
    vt, vb = rot(ctv, cbv)

    # anisotropic GGX NDF  D = 1/max(π a b u², eps)
    u = (ht / a) ** 2 + (hb / b) ** 2 + nh * nh
    du_raw = jnp.pi * a * b * u * u
    live_d = (du_raw > _EPS).astype(cl.dtype)
    d = 1.0 / jnp.maximum(du_raw, _EPS)
    u_s = jnp.maximum(u, _EPS)
    dd_da = d * (-1.0 / a + 4.0 * ht * ht / (u_s * a * a * a)) * live_d
    dd_db = d * (-1.0 / b + 4.0 * hb * hb / (u_s * b * b * b)) * live_d
    dd_dht = -4.0 * d * ht / (u_s * a * a) * live_d
    dd_dhb = -4.0 * d * hb / (u_s * b * b) * live_d
    dd_dnh = -4.0 * d * nh / u_s * live_d

    # height-correlated anisotropic Smith visibility
    sv = jnp.sqrt((a * vt) ** 2 + (b * vb) ** 2 + nv * nv)
    sl = jnp.sqrt((a * lt) ** 2 + (b * lb) ** 2 + nl_s * nl_s)
    den_raw = nl * sv + nv * sl
    live_v = (den_raw > _EPS).astype(cl.dtype)
    den = jnp.maximum(den_raw, _EPS)
    vis = 0.5 / den
    dvis = -0.5 / (den * den) * live_v            # × dden/dX
    sv_s = jnp.maximum(sv, _EPS)
    sl_s = jnp.maximum(sl, _EPS)
    dden_da = nl * a * vt * vt / sv_s + nv * a * lt * lt / sl_s
    dden_db = nl * b * vb * vb / sv_s + nv * b * lb * lb / sl_s
    dden_dnl = sv + nv * nl_s / sl_s              # nl factor + nl_s chain in sl
    dden_dnv = nl * nv / sv_s + sl
    dden_dvt = nl * a * a * vt / sv_s
    dden_dvb = nl * b * b * vb / sv_s
    dden_dlt = nv * a * a * lt / sl_s
    dden_dlb = nv * b * b * lb / sl_s

    inv_pi = 1.0 / jnp.pi
    s_core = d * vis * nl                         # spec / ks
    i_val = kd * inv_pi * nl + ks * s_core * lit

    d_kd = inv_pi * nl
    d_ks = s_core * lit
    d_rx = ks * nl * (dd_da * vis + d * dvis * dden_da) * lit * 2.0 * rx * live_rx
    d_ry = ks * nl * (dd_db * vis + d * dvis * dden_db) * lit * 2.0 * ry * live_ry
    dden_dphi = (
        dden_dvt * vb - dden_dvb * vt + dden_dlt * lb - dden_dlb * lt
    )
    d_phi = ks * nl * (
        (dd_dht * hb - dd_dhb * ht) * vis + d * dvis * dden_dphi
    ) * lit

    pos_l = (cl > 0).astype(cl.dtype)
    d_cl = kd * inv_pi * pos_l \
        + ks * lit * pos_l * (d * vis + d * nl * dvis * dden_dnl)
    d_cnh = ks * lit * dd_dnh * vis * nl
    d_cvn = ks * lit * d * nl * dvis * dden_dnv * (cvn > _EPS).astype(cl.dtype)
    d_cth = ks * lit * nl * vis * (dd_dht * c - dd_dhb * s)
    d_cbh = ks * lit * nl * vis * (dd_dht * s + dd_dhb * c)
    d_ctl = ks * lit * nl * d * dvis * (dden_dlt * c - dden_dlb * s)
    d_cbl = ks * lit * nl * d * dvis * (dden_dlt * s + dden_dlb * c)
    d_ctv = ks * lit * nl * d * dvis * (dden_dvt * c - dden_dvb * s)
    d_cbv = ks * lit * nl * d * dvis * (dden_dvt * s + dden_dvb * c)
    return (
        i_val,
        (d_kd, d_ks, d_rx, d_ry, d_phi),
        (d_cl, d_cnh, d_cvn, d_cth, d_cbh, d_ctl, d_cbl, d_ctv, d_cbv),
    )


SHADING_KERNELS: dict[str, ShadingKernelSpec] = {
    "blinn_phong": ShadingKernelSpec(
        "blinn_phong", 3, ("cos_ln", "cos_nh"), _blinn_phong_full),
    "phong": ShadingKernelSpec(
        "phong", 3, ("cos_ln", "cos_rv"), _phong_full),
    "cook_torrance": ShadingKernelSpec(
        "cook_torrance", 3, ("cos_ln", "cos_nh", "cos_vn"), _cook_torrance_full),
    "cook_torrance_fresnel": ShadingKernelSpec(
        "cook_torrance_fresnel", 4, ("cos_ln", "cos_nh", "cos_vn", "cos_rv"),
        _cook_torrance_fresnel_full),
    "lambert": ShadingKernelSpec("lambert", 1, ("cos_ln",), _lambert_full),
    "minnaert": ShadingKernelSpec(
        "minnaert", 2, ("cos_ln", "cos_vn"), _minnaert_full),
    "ward": ShadingKernelSpec(
        "ward", 3, ("cos_ln", "cos_nh", "cos_vn"), _ward_full),
    "oren_nayar": ShadingKernelSpec(
        "oren_nayar", 2, ("cos_ln", "cos_vn", "cos_rv"), _oren_nayar_full),
    "ward_aniso": ShadingKernelSpec(
        "ward_aniso", 5, ("cos_ln", "cos_nh", "cos_vn", "cos_th", "cos_bh"),
        _ward_aniso_full),
    "cook_torrance_aniso": ShadingKernelSpec(
        "cook_torrance_aniso", 5,
        ("cos_ln", "cos_nh", "cos_vn", "cos_th", "cos_bh",
         "cos_tl", "cos_bl", "cos_tv", "cos_bv"),
        _cook_torrance_aniso_full),
}

_P_ROWS = 8  # params padded to 8 sublanes (f32 tile alignment)


def _unpack(angles_ref, p_ref, spec):
    angles = tuple(angles_ref[a] for a in range(len(spec.angle_names)))
    params = tuple(p_ref[j : j + 1, :] for j in range(spec.n_params))
    return angles, params


def _fwd_kernel(angles_ref, p_ref, out_ref, *, spec: ShadingKernelSpec):
    angles, params = _unpack(angles_ref, p_ref, spec)
    i_val, _, _ = spec.eval(angles, params)
    out_ref[...] = i_val


def _bwd_params_kernel(angles_ref, p_ref, ct_ref, dp_ref, *, spec):
    """Parameter cotangents only. Split from the angle kernel so that when a
    caller differentiates w.r.t. params alone (the per-texel fit hot path),
    XLA dead-code-eliminates the angle pass entirely — the fused dual-output
    kernel forced ~A·V·T of cotangent writes on every backward even when the
    angle gradients were discarded (measured: 0.86× the XLA fusion; split:
    the params-only backward carries no angle traffic at all)."""
    angles, params = _unpack(angles_ref, p_ref, spec)
    _, d_params, _ = spec.eval(angles, params)
    ct = ct_ref[...]
    for j in range(spec.n_params):
        dp_ref[j : j + 1, :] = jnp.sum(d_params[j] * ct, axis=0, keepdims=True)
    for j in range(spec.n_params, _P_ROWS):
        dp_ref[j : j + 1, :] = jnp.zeros_like(p_ref[0:1, :])


def _bwd_angles_kernel(angles_ref, p_ref, ct_ref, dang_ref, *, spec):
    """Angle cotangents only (the joint normal-map path, where gradients flow
    through the angles into normal offsets)."""
    angles, params = _unpack(angles_ref, p_ref, spec)
    _, _, d_angles = spec.eval(angles, params)
    ct = ct_ref[...]
    for a in range(len(spec.angle_names)):
        dang_ref[a] = d_angles[a] * ct


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def _shade_vt(model: str, ang_stack, p_rows, block_t: int, interpret: bool):
    """Views-major core: angles (A, V, Tp), params (8, Tp) → I (V, Tp)."""
    return _shade_vt_fwd(model, ang_stack, p_rows, block_t, interpret)[0]


def _specs_for(a: int, v: int, block_t: int):
    return [
        pl.BlockSpec((a, v, block_t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((_P_ROWS, block_t), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]


def _shade_vt_fwd(model, ang_stack, p_rows, block_t, interpret):
    spec = SHADING_KERNELS[model]
    a, v, tp = ang_stack.shape
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec),
        grid=(tp // block_t,),
        in_specs=_specs_for(a, v, block_t),
        out_specs=pl.BlockSpec((v, block_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, tp), jnp.float32),
        interpret=interpret,
    )(ang_stack, p_rows)
    return out, (ang_stack, p_rows)


def _shade_vt_bwd(model, block_t, interpret, res, ct):
    spec = SHADING_KERNELS[model]
    ang_stack, p_rows = res
    a, v, tp = ang_stack.shape
    ct_spec = pl.BlockSpec((v, block_t), lambda i: (0, i), memory_space=pltpu.VMEM)
    # Two independent pallas calls: whichever cotangent the caller discards
    # is dead code XLA removes (see _bwd_params_kernel docstring). When both
    # are live the forward pieces recompute twice — each pass is
    # bandwidth-bound, so that costs one extra angle read, not 2× time.
    dp = pl.pallas_call(
        functools.partial(_bwd_params_kernel, spec=spec),
        grid=(tp // block_t,),
        in_specs=_specs_for(a, v, block_t) + [ct_spec],
        out_specs=pl.BlockSpec((_P_ROWS, block_t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_P_ROWS, tp), jnp.float32),
        interpret=interpret,
    )(ang_stack, p_rows, ct)
    dang = pl.pallas_call(
        functools.partial(_bwd_angles_kernel, spec=spec),
        grid=(tp // block_t,),
        in_specs=_specs_for(a, v, block_t) + [ct_spec],
        out_specs=pl.BlockSpec((a, v, block_t), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a, v, tp), jnp.float32),
        interpret=interpret,
    )(ang_stack, p_rows, ct)
    return dang, dp


_shade_vt.defvjp(_shade_vt_fwd, _shade_vt_bwd)


@functools.partial(jax.jit, static_argnames=("model", "block_t", "interpret"))
def shade_pallas(
    model: str,
    params: jnp.ndarray,        # (T, P)
    angles: ShadingAngles,      # channels (T, V)
    block_t: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Shade T texels under V lights: the Pallas twin of
    ``models.brdf.brdf_eval`` with analytic forward *and* backward.

    Differentiable w.r.t. ``params`` and every ``angles`` channel via the
    hand-derived VJP kernels (no autodiff inside). Public layout is
    texel-major like the rest of the framework; the wrapper transposes to the
    kernel's views-major layout and pads T to ``block_t`` (the pad's
    cotangents are sliced away by construction).
    """
    spec = SHADING_KERNELS[model]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, v = angles.cos_ln.shape
    # VMEM budget: the backward block holds angles + their cotangents (2·A·V),
    # ct (V), and the two params planes per lane — large view counts must
    # shrink the texel block, not overflow VMEM (CLAUDE.md kernel rule).
    a = len(spec.angle_names)
    lane_bytes = 4 * (2 * a * v + 2 * v + 2 * _P_ROWS)
    vmem_cap = max((8 << 20) // lane_bytes // 128 * 128, 128)
    block_t = min(block_t, vmem_cap, _ceil_to(t, 128))
    pad = (-t) % block_t
    tp = t + pad

    def prep(x):  # (T, V) → (V, Tp)
        return jnp.pad(x.astype(jnp.float32).T, ((0, 0), (0, pad)))

    ang_stack = jnp.stack([prep(getattr(angles, name)) for name in spec.angle_names])
    p_rows = jnp.pad(
        params.astype(jnp.float32).T, ((0, _P_ROWS - spec.n_params), (0, pad))
    )
    out = _shade_vt(model, ang_stack, p_rows, block_t, interpret)
    return out[:, :t].T


def _ceil_to(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
