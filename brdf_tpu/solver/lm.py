"""Batched box-constrained Levenberg-Marquardt in pure JAX.

This module is the TPU-native replacement for the reference's vendored levmar
C library (``/root/reference/levmar/``): the same family of damped
normal-equation solvers, but expressed as ``lax.while_loop`` state machines
that ``vmap`` over thousands of independent problems (texels) and ``jit``
end-to-end, with Jacobians from JAX forward-mode autodiff instead of finite
differences.

Algorithm lineage (with the reference's entry points it replaces):

- :func:`levmar`      — unconstrained LM with adaptive damping and Nielsen's
  gain-ratio μ update (``LEVMAR_DER``/``DIF``, ``levmar/lm_core.c:64-842``).
- :func:`levmar_bc`   — Kanzow-style projected LM for box constraints: step
  from damped normal equations, projected onto the box
  (``LEVMAR_BC_DER``/``DIF``, ``levmar/lmbc_core.c:369-1129`` — the solver the
  reference app actually calls, ``brdfdata.cpp:1058,1119``).
- :func:`levmar_lec`  — linear-equality constraints by null-space elimination
  through a QR factorization (``LEVMAR_LEC_DER``, ``levmar/lmlec_core.c``).

Termination reasons mirror levmar's ``info[6]`` codes (``levmar/lm_core.c:80-90``)
so downstream diagnostics translate directly; counters ``nfev``/``njev``/``nlss``
mirror ``info[7..9]``.

Design notes (TPU):
- One *outer* iteration recomputes the Jacobian (forward-mode: m≈3-8 pushes
  m JVPs through the residual — the right mode for these shapes); an *inner*
  damping loop retries ``(JᵀJ + μI) δ = −g`` with growing μ until a step is
  accepted, re-evaluating only the residual. This matches levmar's loop
  nesting, so autodiff work is never wasted on rejected steps.
- The whole solver is a pytree-carrying ``while_loop``; under ``vmap`` JAX
  batches it (the predicate becomes "any problem still active"), giving
  per-texel early exit semantics without ragged control flow.
- ``JᵀJ`` is m×m (tiny); the damped system is solved by Cholesky. A non-PD
  system yields NaNs, which the acceptance test rejects, growing μ — exactly
  the recovery levmar implements via its solver return codes.
"""

from __future__ import annotations

import enum
import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class StopReason(enum.IntEnum):
    """Termination codes, aligned with levmar ``info[6]`` semantics
    (``levmar/lm_core.c:80-90``)."""

    RUNNING = 0
    SMALL_GRADIENT = 1   # ||J^T e||_inf (projected) below eps1
    SMALL_DP = 2         # ||δp|| below eps2 · ||p||
    MAX_ITERATIONS = 3   # itmax reached
    SINGULAR = 4         # normal equations unsolvable even with large μ
    NO_REDUCTION = 5     # μ overflow: no further reduction possible
    SMALL_CHI2 = 6       # ||e||² below eps3
    INVALID_VALUES = 7   # NaN/Inf residuals at the current point


class LMOptions(NamedTuple):
    """Solver controls. Defaults mirror the reference app's opts
    (``brdfdata.cpp:1049-1057``): ``tau = LM_INIT_MU = 1e-3``,
    ``eps* = {1e-15, 1e-15, 1e-20}``. For float32 problems pass looser
    tolerances (e.g. 1e-6/1e-6/1e-12)."""

    tau: float = 1e-3        # μ0 = tau · max diag(JᵀJ)
    eps1: float = 1e-15      # gradient inf-norm threshold
    eps2: float = 1e-15      # relative step-size threshold
    eps3: float = 1e-20      # χ² threshold
    itmax: int = 100         # outer iterations (reference per-pixel fit value)
    max_inner: int = 24      # damping retries per outer iteration
    mu_max: float = 1e32     # μ ceiling → NO_REDUCTION
    axis_name: str | None = None  # mesh axis holding a sharded residual
                                  # (view/measurement) dimension: χ², JᵀJ, Jᵀe
                                  # become psums over it (SURVEY.md §2.3)
    linsolver: str = "cholesky"   # damped-system solver: "cholesky" | "qr" |
                                  # "lu" | "svd" (the levmar Ax=b suite,
                                  # levmar/Axb_core.c — see _solve_damped)
    damping: str = "add"          # "add": JᵀJ + μI (levmar, lm_core.c:306) |
                                  # "marquardt": JᵀJ + μ·diag(JᵀJ) — scale-
                                  # invariant backoff; μ0 = tau directly
                                  # (dimensionless). Fused-Pallas-tier
                                  # option; measured r4 on the bench
                                  # distribution it RECOVERS WORSE at equal
                                  # itmax (0.933 vs 0.974 @ 12, 0.977 vs
                                  # 0.979 @ 24): with a near-GN τ the flat
                                  # μI backoff is the better trust region
                                  # there. Kept for ill-scaled problems
                                  # where a flat μ dominates weak
                                  # directions.


class LMResult(NamedTuple):
    p: jnp.ndarray          # (..., m) fitted parameters
    chi2: jnp.ndarray       # (...,) final ||e||²          (levmar info[1])
    chi2_init: jnp.ndarray  # (...,) initial ||e||²        (levmar info[0])
    g_inf: jnp.ndarray      # (...,) final projected-gradient inf-norm (info[2])
    iters: jnp.ndarray      # (...,) outer iterations      (info[5])
    stop: jnp.ndarray       # (...,) StopReason            (info[6])
    nfev: jnp.ndarray       # (...,) residual evaluations  (info[7])
    njev: jnp.ndarray       # (...,) Jacobian evaluations  (info[8])
    mu: jnp.ndarray = jnp.nan   # (...,) final damping μ — resume state
    nu: jnp.ndarray = jnp.nan   # (...,) final ν           — resume state
    nlss: jnp.ndarray = jnp.nan  # (...,) linear systems solved (info[9])
    constraint_violation: jnp.ndarray = jnp.nan
    # (...,) max pre-clamp constraint violation — set by the penalty-based
    # solvers (levmar_blec/bleic): a large value flags a penalty-weight
    # failure that the returned (clamped) point would otherwise hide

    def warm_state(self):
        """(μ, ν, stop) triple for resuming via ``levmar_bc(warm_state=...)``:
        lanes stopped at MAX_ITERATIONS are reopened (they were cut off, not
        converged); every other stop code is final and short-circuits."""
        stop = jnp.where(
            self.stop == jnp.int32(StopReason.MAX_ITERATIONS),
            jnp.int32(StopReason.RUNNING),
            self.stop,
        )
        return self.mu, self.nu, stop


class _State(NamedTuple):
    p: jnp.ndarray
    e: jnp.ndarray
    chi2: jnp.ndarray
    g_inf: jnp.ndarray
    mu: jnp.ndarray
    nu: jnp.ndarray
    iters: jnp.ndarray
    stop: jnp.ndarray
    nfev: jnp.ndarray
    njev: jnp.ndarray
    nlss: jnp.ndarray


def _solve_damped(
    jtj: jnp.ndarray, g: jnp.ndarray, mu: jnp.ndarray, method: str = "cholesky"
) -> jnp.ndarray:
    """Solve the damped normal equations ``(JᵀJ + μI) δ = −g``.

    This is the batched stand-in for levmar's interchangeable Ax=b solver
    suite (``levmar/Axb_core.c``; default Bunch-Kaufman selected at
    ``lm_core.c:308``). The damped matrix is symmetric positive definite for
    any μ>0, so BK pivoting buys nothing here; the offered methods are

    - ``"cholesky"`` (default) — ``AX_EQ_B_CHOL`` (``Axb_core.c:446``).
      Non-PD systems produce NaN, which the caller's acceptance test treats
      as a rejected step (the analogue of levmar's linear-solver failure
      path, ``lmbc_core.c:694-700``).
    - ``"qr"``  — ``AX_EQ_B_QR`` (``Axb_core.c:116``).
    - ``"lu"``  — ``AX_EQ_B_LU`` (``Axb_core.c:738``).
    - ``"svd"`` — ``AX_EQ_B_SVD`` (``Axb_core.c:855``): pseudo-inverse with a
      relative singular-value cutoff; the robust choice for (numerically)
      singular systems.
    - ``"ldlt"`` — ``AX_EQ_B_BK`` (``Axb_core.c:1001``): Bunch-Kaufman
      pivoted LDLᵀ, levmar's own default (``lm_core.c:308``). Pointless
      extra work for the SPD damped system (hence not *our* default) but
      provided for exact suite parity; see ``solver/axb.py``.

    The standalone suite (usable outside the LM loop, like levmar's public
    ``dAx_eq_b_*``) lives in :mod:`brdf_tpu.solver.axb`.
    """
    m = jtj.shape[-1]
    dtype = jtj.dtype
    a = jtj + mu * jnp.eye(m, dtype=dtype)
    b = -g
    if method == "cholesky":
        chol = jnp.linalg.cholesky(a)
        y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
        return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)
    if method == "qr":
        q, r = jnp.linalg.qr(a)
        return jax.scipy.linalg.solve_triangular(r, q.T @ b, lower=False)
    if method == "lu":
        lu, piv = jax.scipy.linalg.lu_factor(a)
        return jax.scipy.linalg.lu_solve((lu, piv), b)
    if method == "svd":
        u, s, vt = jnp.linalg.svd(a, full_matrices=False)
        cutoff = jnp.finfo(dtype).eps * m * jnp.max(s)
        s_inv = jnp.where(s > cutoff, 1.0 / jnp.maximum(s, jnp.finfo(dtype).tiny), 0.0)
        return vt.T @ (s_inv * (u.T @ b))
    if method == "ldlt":
        from brdf_tpu.solver.axb import ax_eq_b_ldlt

        return ax_eq_b_ldlt(a, b)
    raise ValueError(f"unknown linsolver {method!r}")


def _lm_single(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    jac_fn: Callable[[jnp.ndarray], jnp.ndarray],
    p0: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    opts: LMOptions,
    warm: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    secant_refresh: int = 0,
) -> LMResult:
    """One box-constrained LM solve (vmapped by the public wrappers).

    ``warm`` is an optional ``(μ0, ν0, stop0)`` resume state (SURVEY.md §5
    checkpoint/resume): μ0≤0 or non-finite means "initialize μ from
    τ·max diag(JᵀJ)" as usual; a non-RUNNING ``stop0`` short-circuits the
    solve (the lane already terminated in an earlier chunk).

    ``secant_refresh > 0`` enables Broyden rank-1 secant Jacobian updates
    between full re-evaluations every ``secant_refresh`` iterations — the
    ``LEVMAR_DIF`` secant scheme (``lm_core.c:578-588, 759-769``). Genuinely
    cheaper only for *unbatched* solves (``lax.cond`` takes one branch): the
    large-n single-material fit. Under ``vmap`` the cond lowers to a select
    that evaluates both branches every iteration, which is why the batched
    texel path defaults to forward-mode AD instead (COMPONENTS.md N2)."""
    dtype = p0.dtype
    eps1 = jnp.asarray(opts.eps1, dtype)
    eps2 = jnp.asarray(opts.eps2, dtype)
    eps3 = jnp.asarray(opts.eps3, dtype)

    if opts.axis_name is not None:
        # Residuals live sharded over a mesh axis (the "view" axis of
        # SURVEY.md §2.3): every contraction over the residual dimension is a
        # partial sum followed by a psum; everything downstream (the m×m
        # solve, the damping control) is replicated and bit-identical across
        # shards.
        def reduce_sum(x):
            return jax.lax.psum(x, opts.axis_name)
    else:
        def reduce_sum(x):
            return x

    def proj(p):
        return jnp.clip(p, lower, upper)

    if warm is None:
        mu_w = jnp.asarray(0.0, dtype)
        nu_w = jnp.asarray(2.0, dtype)
        stop_w = jnp.int32(StopReason.RUNNING)
    else:
        mu_w, nu_w, stop_w = warm
        mu_w = jnp.asarray(mu_w, dtype)
        nu_w = jnp.where(jnp.isfinite(nu_w), nu_w, 2.0).astype(dtype)
        stop_w = jnp.asarray(stop_w, jnp.int32)
    warm_mu_valid = jnp.isfinite(mu_w) & (mu_w > 0)
    mu_w = jnp.where(warm_mu_valid, mu_w, 0.0)

    p0 = proj(p0)
    e0 = residual_fn(p0)
    chi2_0 = reduce_sum(jnp.dot(e0, e0))
    stop0 = jnp.where(
        jnp.isfinite(chi2_0),
        jnp.int32(StopReason.RUNNING),
        jnp.int32(StopReason.INVALID_VALUES),
    )
    stop0 = jnp.where(stop_w != StopReason.RUNNING, stop_w, stop0)

    init = _State(
        p=p0,
        e=e0,
        chi2=chi2_0,
        g_inf=jnp.asarray(jnp.inf, dtype),
        mu=mu_w,
        nu=nu_w,
        iters=jnp.int32(0),
        stop=stop0,
        nfev=jnp.int32(1),
        njev=jnp.int32(0),
        nlss=jnp.int32(0),
    )

    def cond(s: _State):
        return (s.stop == StopReason.RUNNING) & (s.iters < opts.itmax)

    def body(s: _State) -> _State:
        return _step(s, jac_fn(s.p), jnp.int32(1))

    def _step(s: _State, j: jnp.ndarray, njev_inc) -> _State:
        jtj = reduce_sum(j.T @ j)             # (m, m)
        g = reduce_sum(j.T @ s.e)             # (m,)

        # Projected-gradient convergence measure: for interior points this is
        # ‖g‖_inf; at active bounds, components pushing outward drop out —
        # the batched analogue of lmbc's free-variable test
        # (lmbc_core.c:634-646).
        pg = s.p - proj(s.p - g)
        g_inf = jnp.max(jnp.abs(pg))
        grad_conv = g_inf <= eps1

        # Active-set freeze: a variable sitting exactly on a bound whose
        # gradient pushes outward is removed from the normal equations, so the
        # free variables take a proper (not clipped-compromise) damped-GN
        # step. This is the batched stand-in for lmbc's free-subvector
        # handling (lmbc_core.c:634-646, 871-946): clipping alone lets a
        # stuck coordinate poison the whole step.
        frozen = ((s.p <= lower) & (g > 0)) | ((s.p >= upper) & (g < 0))
        free = (~frozen).astype(dtype)
        free_outer = free[:, None] * free[None, :]
        jtj_f = jtj * free_outer + jnp.diag(jnp.where(frozen, 1.0, 0.0).astype(dtype))
        g_f = g * free

        mu = jnp.where(
            (s.iters == 0) & (s.mu <= 0),
            opts.tau * jnp.max(jnp.diagonal(jtj)),
            s.mu,
        ).astype(dtype)

        class Inner(NamedTuple):
            mu: jnp.ndarray
            nu: jnp.ndarray
            p: jnp.ndarray
            e: jnp.ndarray
            chi2: jnp.ndarray
            stop: jnp.ndarray
            nfev: jnp.ndarray
            accepted: jnp.ndarray
            tries: jnp.ndarray

        inner0 = Inner(
            mu=mu, nu=s.nu, p=s.p, e=s.e, chi2=s.chi2,
            stop=jnp.int32(StopReason.RUNNING), nfev=s.nfev,
            accepted=jnp.bool_(False), tries=jnp.int32(0),
        )

        def inner_cond(t: Inner):
            return (
                (~t.accepted)
                & (t.stop == StopReason.RUNNING)
                & (t.tries < opts.max_inner)
            )

        def inner_body(t: Inner) -> Inner:
            dp = _solve_damped(jtj_f, g_f, t.mu, opts.linsolver)
            pnew = proj(s.p + dp)
            dpa = pnew - s.p                  # actual (projected) step
            dp_norm2 = jnp.dot(dpa, dpa)
            p_norm2 = jnp.dot(s.p, s.p)
            solver_failed = ~jnp.all(jnp.isfinite(dp))

            small_dp = dp_norm2 <= eps2 * eps2 * p_norm2

            enew = residual_fn(pnew)
            chi2new = reduce_sum(jnp.dot(enew, enew))
            finite = jnp.isfinite(chi2new)
            df = t.chi2 - chi2new
            # Predicted reduction from the quadratic model,
            # −(2 gᵀδ + δᵀ JᵀJ δ): for the exact (unclipped) damped solve this
            # equals Madsen/Nielsen's δᵀ(μδ − g) (lm_core.c:367-396), but
            # unlike that shortcut it stays valid when the step has been
            # projected onto the box.
            dl = -(2.0 * jnp.dot(g, dpa) + jnp.dot(dpa, jtj @ dpa))

            accept = (~solver_failed) & finite & (df > 0)

            # Nielsen μ update on accept; ν-doubling on reject
            rho = jnp.where(dl > 0, df / jnp.maximum(dl, jnp.finfo(dtype).tiny), 1.0)
            tmp = 2.0 * rho - 1.0
            mu_acc = t.mu * jnp.maximum(1.0 / 3.0, 1.0 - tmp * tmp * tmp)
            mu_rej = t.mu * t.nu
            mu_next = jnp.where(accept, mu_acc, mu_rej).astype(dtype)
            nu_next = jnp.where(accept, jnp.asarray(2.0, dtype), t.nu * 2.0)

            stop = jnp.int32(StopReason.RUNNING)
            stop = jnp.where(
                small_dp & ~solver_failed, jnp.int32(StopReason.SMALL_DP), stop
            )
            stop = jnp.where(
                mu_next > opts.mu_max, jnp.int32(StopReason.NO_REDUCTION), stop
            )
            stop = jnp.where(
                solver_failed & (t.mu > opts.mu_max / 2),
                jnp.int32(StopReason.SINGULAR),
                stop,
            )

            return Inner(
                mu=mu_next,
                nu=nu_next,
                p=jnp.where(accept, pnew, t.p),
                e=jnp.where(accept, enew, t.e),
                chi2=jnp.where(accept, chi2new, t.chi2),
                stop=stop,
                nfev=t.nfev + 1,
                accepted=accept,
                tries=t.tries + 1,
            )

        t = jax.lax.while_loop(inner_cond, inner_body, inner0)

        chi2_conv = t.chi2 <= eps3
        stop = t.stop
        stop = jnp.where(
            (stop == StopReason.RUNNING) & (~t.accepted),
            jnp.int32(StopReason.NO_REDUCTION),
            stop,
        )
        stop = jnp.where(chi2_conv, jnp.int32(StopReason.SMALL_CHI2), stop)
        stop = jnp.where(grad_conv, jnp.int32(StopReason.SMALL_GRADIENT), stop)

        return _State(
            p=t.p,
            e=t.e,
            chi2=t.chi2,
            g_inf=g_inf,
            mu=t.mu,
            nu=t.nu,
            iters=s.iters + 1,
            stop=stop,
            nfev=t.nfev,
            njev=s.njev + njev_inc,
            nlss=s.nlss + t.tries,   # one damped solve per inner try (info[9])
        )

    if secant_refresh > 0:
        # Broyden carry: (state, J, point/residual J is valid at, age).
        jac0 = jac_fn(p0)
        carry0 = (init._replace(njev=jnp.int32(1)), jac0, p0, e0, jnp.int32(0))

        def cond2(c):
            return cond(c[0])

        def body2(c):
            s, jac_c, p_prev, e_prev, age = c
            dp_s = s.p - p_prev
            de_s = s.e - e_prev
            den = jnp.dot(dp_s, dp_s)
            tiny = jnp.finfo(dtype).tiny
            # rank-1 secant: J += ((Δe − J Δp) Δpᵀ)/‖Δp‖² (lm_core.c:578-588)
            j_upd = jac_c + jnp.outer(
                de_s - jac_c @ dp_s, dp_s
            ) / jnp.maximum(den, tiny)
            j_upd = jnp.where(den > tiny, j_upd, jac_c)
            # Refresh on age, and whenever damping has blown up through
            # rejected steps (ν > 16): a stale Broyden Jacobian is the usual
            # culprit, and levmar's LEVMAR_DIF forces a fresh one there too
            # (lm_core.c:578, the `updp && nu>16` recovery path).
            nu_blown = s.nu > 16.0
            j, age_n, dj = jax.lax.cond(
                (age >= secant_refresh) | nu_blown,
                lambda: (jac_fn(s.p), jnp.int32(0), jnp.int32(1)),
                lambda: (j_upd, age + jnp.int32(1), jnp.int32(0)),
            )
            # One-shot semantics (lm_core.c:587 sets nu=2 with the refresh):
            # without the reset, a run of consecutive rejections keeps ν > 16
            # and recomputes the identical Jacobian at the unchanged p every
            # iteration, inflating njev for nothing.
            s = s._replace(
                nu=jnp.where(nu_blown, jnp.asarray(2.0, s.nu.dtype), s.nu)
            )
            return (_step(s, j, dj), j, s.p, s.e, age_n)

        final = jax.lax.while_loop(cond2, body2, carry0)[0]
    else:
        final = jax.lax.while_loop(cond, body, init)
    stop = jnp.where(
        final.stop == StopReason.RUNNING,
        jnp.int32(StopReason.MAX_ITERATIONS),
        final.stop,
    )
    return LMResult(
        p=final.p,
        chi2=final.chi2,
        chi2_init=chi2_0,
        g_inf=final.g_inf,
        iters=final.iters,
        stop=stop,
        nfev=final.nfev,
        njev=final.njev,
        mu=final.mu,
        nu=final.nu,
        nlss=final.nlss,
        constraint_violation=jnp.zeros((), dtype),
    )


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def _prep_bounds(p0, lower, upper):
    m = p0.shape[-1]
    dtype = p0.dtype
    if lower is None:
        lower = jnp.full((m,), -jnp.inf, dtype)
    else:
        lower = jnp.broadcast_to(jnp.asarray(lower, dtype), (m,))
    if upper is None:
        upper = jnp.full((m,), jnp.inf, dtype)
    else:
        upper = jnp.broadcast_to(jnp.asarray(upper, dtype), (m,))
    return lower, upper


def levmar_bc(
    residual_fn: Callable[..., jnp.ndarray],
    p0: jnp.ndarray,
    lower=None,
    upper=None,
    data: Any = None,
    opts: LMOptions = LMOptions(),
    jac_fn: Callable[..., jnp.ndarray] | None = None,
    data_axes: Any = 0,
    jac_mode: str = "auto",
    warm_state=None,
    dscl=None,
    secant_refresh: int = 10,
) -> LMResult:
    """Box-constrained LM (replaces ``dlevmar_bc_der``/``dlevmar_bc_dif``,
    ``levmar/levmar.h:126-146``).

    Args:
      residual_fn: ``residual_fn(p, data) -> (n,)`` residuals; the solver
        minimizes their squared norm. (levmar took the model ``hx`` and target
        ``x`` separately; here the caller folds the target into the residual.)
      p0: ``(m,)`` single problem or ``(B, m)`` batch of independent problems
        (the vmapped analogue of the reference's per-pixel loop,
        ``brdfdata.cpp:1195-1221``).
      lower/upper: box bounds, scalars or ``(m,)`` (``None`` → unconstrained).
      data: per-problem auxiliary pytree (leading batch dim when batched).
      jac_fn: optional analytic Jacobian ``(p, data) -> (n, m)``; defaults to
        forward-mode autodiff.
      data_axes: vmap axes for ``data`` (``None`` to broadcast shared data).
      jac_mode: "auto" (forward-mode AD), "fd" (forward differences — the
        ``*_dif`` behavior, ``misc_core.c:137-172``), "fd_central", or
        "secant" (Broyden rank-1 updates between full-FD refreshes every
        ``secant_refresh`` iterations — ``LEVMAR_DIF``'s scheme,
        ``lm_core.c:578-588``; worthwhile for *unbatched* large-n solves,
        see ``_lm_single``). Ignored when ``jac_fn`` is given. AD is exact
        and the default; FD/secant exist for parity/validation and for
        non-differentiable residuals.
      warm_state: optional ``(μ, ν, stop)`` triple — typically
        ``prev.warm_state()`` from an earlier :class:`LMResult` — that resumes
        a chunked fit exactly where it left off (with ``p0 = prev.p``): damping
        state carries over and already-terminated lanes short-circuit
        (SURVEY.md §5 checkpoint/resume).
      dscl: optional ``(m,)`` positive diagonal scaling — the solver works on
        ``p/dscl`` (bounds, steps, and the eps2 step test are all in scaled
        variables) and unscales the result, exactly levmar's ``dscl``
        handling (``lmbc_core.c:360-366``, decls ``levmar.h:129,141``).
        Useful when parameters differ by orders of magnitude.
    """
    batched = p0.ndim == 2

    if dscl is not None:
        dscl = jnp.broadcast_to(jnp.asarray(dscl, p0.dtype), (p0.shape[-1],))
        inner_residual, inner_jac = residual_fn, jac_fn
        residual_fn = lambda ps, d: inner_residual(ps * dscl, d)
        if inner_jac is not None:
            # chain rule: columns of J scale by dscl (lmbc_core.c:575-580)
            jac_fn = lambda ps, d: inner_jac(ps * dscl, d) * dscl[None, :]
        p0 = p0 / dscl
        if lower is not None:
            lower = jnp.asarray(lower, p0.dtype) / dscl
        if upper is not None:
            upper = jnp.asarray(upper, p0.dtype) / dscl
        res = levmar_bc(
            residual_fn, p0, lower, upper, data=data, opts=opts, jac_fn=jac_fn,
            data_axes=data_axes, jac_mode=jac_mode, warm_state=warm_state,
            secant_refresh=secant_refresh,
        )
        return res._replace(p=res.p * dscl)

    if jac_fn is not None:
        jac_of = jac_fn
    elif jac_mode == "auto":
        def jac_of(p, d):
            return jax.jacfwd(lambda q: residual_fn(q, d))(p)
    elif jac_mode in ("fd", "fd_central", "secant"):
        # "secant" refreshes via forward differences like LEVMAR_DIF
        # (lmbc_core.c:1043-1054) and Broyden-updates in between
        def jac_of(p, d):
            return fd_jacobian(
                residual_fn, p, d, central=(jac_mode == "fd_central")
            )
    else:
        raise ValueError(f"unknown jac_mode {jac_mode!r}")
    secant_k = int(secant_refresh) if jac_mode == "secant" else 0

    lower_b, upper_b = _prep_bounds(p0, lower, upper)

    if warm_state is None:
        batch_shape = p0.shape[:-1]
        warm = (
            jnp.zeros(batch_shape, p0.dtype),
            jnp.full(batch_shape, 2.0, p0.dtype),
            jnp.full(batch_shape, int(StopReason.RUNNING), jnp.int32),
        )
    else:
        warm = tuple(jnp.asarray(w) for w in warm_state)

    def solve_one(p0_i, data_i, warm_i):
        return _lm_single(
            functools.partial(_flip_args(residual_fn), data_i),
            functools.partial(_flip_args(jac_of), data_i),
            p0_i,
            lower_b,
            upper_b,
            opts,
            warm=warm_i,
            secant_refresh=secant_k,
        )

    if batched:
        return jax.vmap(solve_one, in_axes=(0, data_axes, 0))(p0, data, warm)
    return solve_one(p0, data, warm)


def _flip_args(fn):
    return lambda d, p: fn(p, d)


def levmar(
    residual_fn, p0, data=None, opts=LMOptions(), jac_fn=None, data_axes=0,
    warm_state=None,
) -> LMResult:
    """Unconstrained LM (replaces ``dlevmar_der``/``dlevmar_dif``,
    ``levmar/levmar.h:106-124``) — the box solver with infinite bounds; the
    projection and projected-gradient test then reduce to the identity and the
    plain ``‖JᵀE‖_inf`` test of ``lm_core.c``."""
    return levmar_bc(
        residual_fn, p0, None, None, data=data, opts=opts, jac_fn=jac_fn,
        data_axes=data_axes, warm_state=warm_state,
    )


def levmar_lec(
    residual_fn,
    p0: jnp.ndarray,
    A: jnp.ndarray,
    b: jnp.ndarray,
    data: Any = None,
    opts: LMOptions = LMOptions(),
    data_axes: Any = 0,
) -> LMResult:
    """Linear-equality-constrained LM: minimize ``‖r(p)‖²`` s.t. ``A p = b``.

    Null-space elimination exactly as ``levmar/lmlec_core.c:92+``: with
    ``Aᵀ = QR``, every feasible point is ``p = c + Z y`` where ``c`` is the
    min-norm solution of ``A c = b`` and ``Z`` spans ``null(A)``; the problem
    reduces to unconstrained LM over ``y ∈ R^{m-k}``.
    """
    A = jnp.asarray(A, p0.dtype)
    b = jnp.asarray(b, p0.dtype)
    k, m = A.shape
    q_full, _ = jnp.linalg.qr(A.T, mode="complete")  # (m, m)
    z = q_full[:, k:]                                # (m, m-k) null-space basis
    c = A.T @ jnp.linalg.solve(A @ A.T, b)           # min-norm particular sol.

    def reduced_residual(y, d):
        return residual_fn(c + z @ y, d)

    batched = p0.ndim == 2
    if batched:
        y0 = (p0 - c[None, :]) @ z
    else:
        y0 = z.T @ (p0 - c)

    res = levmar(reduced_residual, y0, data=data, opts=opts, data_axes=data_axes)
    if batched:
        p_fit = c[None, :] + res.p @ z.T
    else:
        p_fit = c + z @ res.p
    return res._replace(p=p_fit)


# ---------------------------------------------------------------------------
# Jacobian utilities (levmar/misc_core.c equivalents)
# ---------------------------------------------------------------------------


def fd_jacobian(
    residual_fn, p: jnp.ndarray, data=None, delta: float = 1e-6, central: bool = True
) -> jnp.ndarray:
    """Finite-difference Jacobian with levmar's per-element step rule
    ``d_j = max(1e-4·|p_j|, δ)`` (``levmar/misc_core.c:137-211``). Used in
    tests to cross-check autodiff, in the spirit of ``dlevmar_chkjac``."""
    m = p.shape[-1]
    d = jnp.maximum(1e-4 * jnp.abs(p), delta)

    def col(j):
        dp = jnp.zeros_like(p).at[j].set(d[j])
        if central:
            return (residual_fn(p + dp, data) - residual_fn(p - dp, data)) / (2 * d[j])
        return (residual_fn(p + dp, data) - residual_fn(p, data)) / d[j]

    cols = [col(j) for j in range(m)]
    return jnp.stack(cols, axis=-1)


def check_jacobian(
    residual_fn, p: jnp.ndarray, data=None, jac_fn=None, delta: float = 1e-6
):
    """Relative agreement between the autodiff (or supplied) Jacobian and a
    central-difference one — the role of ``dlevmar_chkjac``
    (``levmar/misc_core.c:250-321``). Returns the max relative error."""
    if jac_fn is None:
        jac = jax.jacfwd(lambda q: residual_fn(q, data))(p)
    else:
        jac = jac_fn(p, data)
    fd = fd_jacobian(residual_fn, p, data, delta=delta)
    scale = jnp.maximum(jnp.abs(jac) + jnp.abs(fd), 1e-8)
    return jnp.max(jnp.abs(jac - fd) / scale)


def chkjac(residual_fn, p: jnp.ndarray, data=None, jac_fn=None) -> jnp.ndarray:
    """Per-residual Jacobian correctness scores in [0, 1] — the faithful
    MINPACK-CHKDER port levmar ships as ``dlevmar_chkjac``
    (``levmar/misc_core.c:250-321``; usage template ``lmdemo.c:928-935``).

    For each residual component i the score grades how well the directional
    derivative predicted by the Jacobian matches the actual change of the
    residual under the CHKDER probe point ``pp_j = p_j + √ε·|p_j|``:
    1.0 = agreement to machine precision, 0.0 = no significant agreement,
    with a log-interpolated grade in between. Unlike
    :func:`check_jacobian` (a single max-relative-error scalar, the form the
    tests assert on), this returns the reference's exact (n,) diagnostic.
    """
    dtype = p.dtype
    epsmch = jnp.finfo(dtype).eps
    eps = jnp.sqrt(epsmch)
    epsf = 100.0 * epsmch
    epslog = jnp.log10(eps)

    if jac_fn is None:
        jac = jax.jacfwd(lambda q: residual_fn(q, data))(p)
    else:
        jac = jac_fn(p, data)

    # CHKDER mode-1 probe point: perturb every component at once
    temp_j = jnp.where(p == 0, eps, eps * jnp.abs(p))
    pp = p + temp_j
    fvec = residual_fn(p, data)
    fvecp = residual_fn(pp, data)

    # mode-2 scoring (misc_core.c:289-319)
    scale_j = jnp.where(jnp.abs(p) == 0, 1.0, jnp.abs(p))
    err = jac @ scale_j                                   # Σ_j |p_j|·J_ij
    df = fvecp - fvec
    significant = (
        (fvec != 0) & (fvecp != 0) & (jnp.abs(df) >= epsf * jnp.abs(fvec))
    )
    temp = jnp.where(
        significant,
        eps * jnp.abs(df / eps - err) / (jnp.abs(fvec) + jnp.abs(fvecp)),
        1.0,
    )
    score = jnp.ones_like(fvec)
    score = jnp.where(
        (temp > epsmch) & (temp < eps), (jnp.log10(temp) - epslog) / epslog, score
    )
    score = jnp.where(temp >= eps, 0.0, score)
    return score
