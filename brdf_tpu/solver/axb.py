"""Dense ``Ax = b`` solver suite — levmar's interchangeable linear solvers.

The reference vendors seven augmented-normal-equation solvers
(``levmar/Axb_core.c``; public API ``dAx_eq_b_*``, ``levmar/levmar.h:316-343``)
and selects Bunch-Kaufman LDLᵀ as the default inside every LM loop
(``levmar/lm_core.c:308``, ``lmbc_core.c:691``). This module is the TPU-native
equivalent: every solver is a pure-JAX function of one dense system that
``jit``\\ s, ``vmap``\\ s over texel batches, and is dtype-parametric
(float32/float64).

===================  =======================  ==================================
here                 levmar                   method
===================  =======================  ==================================
:func:`ax_eq_b_qr`   ``Axb_core.c:116``       QR (square A)
:func:`ax_eq_b_qrls` ``Axb_core.c:275``       QR least squares (tall A, m ≥ n)
:func:`ax_eq_b_chol` ``Axb_core.c:446``       Cholesky (SPD A)
:func:`ax_eq_b_lu`   ``Axb_core.c:738``       LU with partial pivoting
:func:`ax_eq_b_svd`  ``Axb_core.c:855``       SVD pseudo-inverse (rank-deficient)
:func:`ax_eq_b_ldlt` ``Axb_core.c:1001``      **Bunch-Kaufman LDLᵀ** (symmetric,
                                              possibly indefinite — the levmar
                                              default)
===================  =======================  ==================================

The seventh variant, PLASMA's multicore Cholesky (``Axb_core.c:633``), is a
CPU-era answer to "many cores, one factorization". On TPU that role is filled
by *batching*, not by parallelizing a single tiny factorization:
``jax.vmap(ax_eq_b_chol)`` over texels keeps every lane of the VPU busy and
``shard_map`` spreads the batch over the mesh — the same resource-utilization
goal, achieved the way the hardware wants. See ``LMOptions.linsolver`` for the
wiring into the LM loops.

Singular systems follow the levmar failure convention translated to SPMD: a
zero pivot produces non-finite entries in the solution, which the LM
acceptance test treats as a rejected step (μ grows), exactly like levmar's
solver-return-code path (``lmbc_core.c:694-700``). Use :func:`ax_eq_b_svd`
when a minimum-norm solution to a singular system is wanted instead.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

__all__ = [
    "ax_eq_b_qr",
    "ax_eq_b_qrls",
    "ax_eq_b_chol",
    "ax_eq_b_lu",
    "ax_eq_b_svd",
    "ax_eq_b_ldlt",
    "ldlt_bk",
]


def ax_eq_b_qr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Square system via QR (``AX_EQ_B_QR``, ``Axb_core.c:116``)."""
    q, r = jnp.linalg.qr(a)
    return jax.scipy.linalg.solve_triangular(r, q.T @ b, lower=False)


def ax_eq_b_qrls(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Tall least-squares system via QR (``AX_EQ_B_QRLS``, ``Axb_core.c:275``):
    minimizes ``‖Ax − b‖₂`` for A of shape (m, n), m ≥ n, full column rank."""
    q, r = jnp.linalg.qr(a)  # reduced: q (m, n), r (n, n)
    return jax.scipy.linalg.solve_triangular(r, q.T @ b, lower=False)


def ax_eq_b_chol(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SPD system via Cholesky (``AX_EQ_B_CHOL``, ``Axb_core.c:446``)."""
    chol = jnp.linalg.cholesky(a)
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)


def ax_eq_b_lu(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """General square system via LU (``AX_EQ_B_LU``, ``Axb_core.c:738``)."""
    lu, piv = jax.scipy.linalg.lu_factor(a)
    return jax.scipy.linalg.lu_solve((lu, piv), b)


def ax_eq_b_svd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Minimum-norm solution via SVD pseudo-inverse with a relative
    singular-value cutoff (``AX_EQ_B_SVD``, ``Axb_core.c:855``)."""
    u, s, vt = jnp.linalg.svd(a, full_matrices=False)
    cutoff = jnp.finfo(a.dtype).eps * a.shape[-1] * jnp.max(s)
    s_inv = jnp.where(s > cutoff, 1.0 / jnp.maximum(s, jnp.finfo(a.dtype).tiny), 0.0)
    return vt.T @ (s_inv * (u.T @ b))


# ---------------------------------------------------------------------------
# Bunch-Kaufman LDLᵀ
# ---------------------------------------------------------------------------

# Bunch-Kaufman pivot threshold: minimizes the bound on element growth
# between 1×1 and 2×2 pivots (Bunch & Kaufman 1977; LAPACK ?sytf2).
_ALPHA = (1.0 + math.sqrt(17.0)) / 8.0


@functools.partial(jax.jit, static_argnames=())
def ldlt_bk(a: jnp.ndarray):
    """Bunch-Kaufman LDLᵀ factorization of a symmetric matrix.

    Computes ``A[perm][:, perm] = L D Lᵀ`` where L is unit lower triangular
    and D is block diagonal with 1×1 and 2×2 blocks, using the partial
    (Bunch-Kaufman 1977) pivoting strategy of LAPACK's ``?sytf2`` — the same
    algorithm behind levmar's default solver (``AX_EQ_B_BK``,
    ``Axb_core.c:1001``, which calls LAPACK ``?sytrf``/``?sytrs``).

    The TPU-native formulation: instead of LAPACK's in-place column sweeps,
    the factorization is a ``lax.fori_loop`` over at most n pivot steps whose
    body performs full-matrix masked updates (rank-1 or rank-2 trailing
    updates as outer products) — branch-free except for one ``lax.cond`` on
    the pivot size, so it ``vmap``\\ s cleanly over batches of systems (lanes
    that finish early no-op via a mask, mirroring how the batched LM loop
    masks converged texels).

    Returns ``(lmat, d0, d1, block2, perm)``:

    - ``lmat``  — (n, n) unit lower triangular L
    - ``d0``    — (n,) diagonal of D
    - ``d1``    — (n,) subdiagonal of D (``d1[k] = D[k+1, k]``, nonzero only
      where ``block2[k]``)
    - ``block2``— (n,) bool, True where a 2×2 block *starts*
    - ``perm``  — (n,) int32 row/column permutation
    """
    n = a.shape[-1]
    dtype = a.dtype
    alpha = jnp.asarray(_ALPHA, dtype)
    rows = jnp.arange(n)

    def swap(mat_aw, mat_l, perm, i, j, k):
        """Symmetric row/col swap i↔j of the working matrix; rows i↔j of L
        restricted to the already-computed columns (< k), LAPACK-style."""
        idx = jnp.where(rows == i, j, jnp.where(rows == j, i, rows))
        mat_aw = mat_aw[idx][:, idx]
        colmask = rows < k
        row_i, row_j = mat_l[i], mat_l[j]
        new_i = jnp.where(colmask, row_j, row_i)
        new_j = jnp.where(colmask, row_i, row_j)
        mat_l = mat_l.at[i].set(new_i).at[j].set(new_j)
        return mat_aw, mat_l, perm[idx]

    def body(_, state):
        aw, lmat, d0, d1, b2, perm, k = state
        active = k < n

        kk = jnp.minimum(k, n - 1)  # clamped for safe indexing when done
        absakk = jnp.abs(aw[kk, kk])

        # largest |A[i, k]| below the diagonal
        col = jnp.abs(aw[:, kk])
        col = jnp.where(rows > kk, col, -jnp.inf)
        r = jnp.argmax(col)
        colmax = jnp.where(kk < n - 1, col[r], jnp.asarray(0.0, dtype))

        # largest off-diagonal |A[r, j]| in the trailing submatrix row r
        rowv = jnp.abs(aw[r, :])
        rowv = jnp.where((rows >= kk) & (rows != r), rowv, -jnp.inf)
        rowmax = jnp.maximum(jnp.max(rowv), jnp.asarray(0.0, dtype))

        take_1x1_noswap = absakk >= alpha * colmax
        take_1x1_row = absakk * rowmax >= alpha * colmax * colmax
        take_1x1_diag = jnp.abs(aw[r, r]) >= alpha * rowmax
        # degenerate all-zero column: treat as a 1×1 zero pivot (→ inf/NaN in
        # the solve, the levmar singular-system signal)
        take_1x1_noswap = take_1x1_noswap | (jnp.maximum(absakk, colmax) == 0)

        step2 = ~(take_1x1_noswap | take_1x1_row | take_1x1_diag)
        do_swap = ~take_1x1_noswap & ~take_1x1_row
        # 1×1 with swap exchanges k↔r; 2×2 exchanges (k+1)↔r
        swap_from = jnp.where(step2, jnp.minimum(kk + 1, n - 1), kk)
        kp = jnp.where(do_swap, r, swap_from)

        aw_s, lmat_s, perm_s = swap(aw, lmat, perm, swap_from, kp, kk)
        aw = jnp.where(active & do_swap, aw_s, aw)
        lmat = jnp.where(active & do_swap, lmat_s, lmat)
        perm = jnp.where(active & do_swap, perm_s, perm)

        def pivot1(args):
            aw, lmat, d0, d1, b2 = args
            d = aw[kk, kk]
            colv = jnp.where(rows > kk, aw[:, kk], 0.0)
            lcol = colv / jnp.where(d == 0, jnp.asarray(1.0, dtype), d)
            lcol = jnp.where(d == 0, jnp.where(colv != 0, jnp.inf, 0.0), lcol)
            lmat = lmat.at[:, kk].set(jnp.where(rows > kk, lcol, lmat[:, kk]))
            aw = aw - jnp.outer(lcol, colv)
            d0 = d0.at[kk].set(d)
            d1 = d1.at[kk].set(0.0)
            b2 = b2.at[kk].set(False)
            return aw, lmat, d0, d1, b2, kk + 1

        def pivot2(args):
            aw, lmat, d0, d1, b2 = args
            k1 = jnp.minimum(kk + 1, n - 1)
            b00, b10, b11 = aw[kk, kk], aw[k1, kk], aw[k1, k1]
            det = b00 * b11 - b10 * b10
            c0 = jnp.where(rows > k1, aw[:, kk], 0.0)
            c1 = jnp.where(rows > k1, aw[:, k1], 0.0)
            # [l0 l1] = [c0 c1] · B⁻¹
            l0 = (c0 * b11 - c1 * b10) / det
            l1 = (c1 * b00 - c0 * b10) / det
            lmat = lmat.at[:, kk].set(jnp.where(rows > k1, l0, lmat[:, kk]))
            lmat = lmat.at[:, k1].set(jnp.where(rows > k1, l1, lmat[:, k1]))
            aw = aw - jnp.outer(l0, c0) - jnp.outer(l1, c1)
            d0 = d0.at[kk].set(b00).at[k1].set(b11)
            d1 = d1.at[kk].set(b10)
            b2 = b2.at[kk].set(True)
            return aw, lmat, d0, d1, b2, kk + 2

        aw_n, lmat_n, d0_n, d1_n, b2_n, k_n = jax.lax.cond(
            step2, pivot2, pivot1, (aw, lmat, d0, d1, b2)
        )
        # lanes past the end (k ≥ n under vmap) keep their state unchanged
        sel = lambda new, old: jnp.where(active, new, old)
        return (
            sel(aw_n, aw), sel(lmat_n, lmat), sel(d0_n, d0), sel(d1_n, d1),
            sel(b2_n, b2), perm, jnp.where(active, k_n, k),
        )

    state = (
        a.astype(dtype),
        jnp.eye(n, dtype=dtype),
        jnp.zeros((n,), dtype),
        jnp.zeros((n,), dtype),
        jnp.zeros((n,), bool),
        jnp.arange(n, dtype=jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    _, lmat, d0, d1, b2, perm, _ = jax.lax.fori_loop(0, n, body, state)
    return lmat, d0, d1, b2, perm


def _block_diag_solve(d0, d1, b2, w):
    """Solve ``D y = w`` for block-diagonal D given as (diag, subdiag, starts).

    Vectorized over the whole vector: every position is either the start of a
    2×2 block, the second element of one, or a 1×1 block; all three candidate
    solutions are computed elementwise and selected by mask. ``b2[n-1]`` is
    False by construction, so the roll wrap-arounds only feed unselected
    lanes."""
    d0n = jnp.roll(d0, -1)
    wn = jnp.roll(w, -1)
    det = d0 * d0n - d1 * d1
    y_first = (d0n * w - d1 * wn) / det            # start of a 2×2 block
    d0p, d1p, wp = jnp.roll(d0, 1), jnp.roll(d1, 1), jnp.roll(w, 1)
    b2p = jnp.roll(b2, 1)
    detp = d0p * d0 - d1p * d1p
    y_second = (d0p * w - d1p * wp) / detp         # second elem of a 2×2 block
    return jnp.where(b2, y_first, jnp.where(b2p, y_second, w / d0))


def ax_eq_b_ldlt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Symmetric (possibly indefinite) system via Bunch-Kaufman LDLᵀ — the
    levmar default (``AX_EQ_B_BK``, ``Axb_core.c:1001``; selected in the LM
    loops at ``lm_core.c:308`` / ``lmbc_core.c:691``).

    Unlike unpivoted LDLᵀ/Cholesky this is stable for indefinite A (e.g. the
    near-zero-diagonal two-by-twos where unpivoted elimination explodes) and
    never takes square roots, so it also serves as a drop-in for SPD damped
    systems when a pivoted factorization is wanted."""
    lmat, d0, d1, b2, perm = ldlt_bk(a)
    z = b[perm]
    w = jax.scipy.linalg.solve_triangular(lmat, z, lower=True, unit_diagonal=True)
    y = _block_diag_solve(d0, d1, b2, w)
    u = jax.scipy.linalg.solve_triangular(
        lmat.T, y, lower=False, unit_diagonal=True
    )
    return jnp.zeros_like(u).at[perm].set(u)
