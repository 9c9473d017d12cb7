"""Centering-fused contractions.

The reference materializes the centered matrix ``X − 1μᵀ`` before every
factorization (pca.rs:216-219, 531; ica.rs:178-188) — an extra n×d
buffer and an extra full HBM pass.  On TPU the mean is a rank-1
correction that fuses into each matmul algebraically:

    (X − 1μᵀ)·Ω   = X·Ω − 1·(μᵀΩ)
    (X − 1μᵀ)ᵀ·Q  = XᵀQ − μ·(1ᵀQ)
    (X − 1μᵀ)ᵀ(X − 1μᵀ) = XᵀX − n·μμᵀ
    ‖X − 1μᵀ‖²_F  = ‖X‖²_F − n·‖μ‖²

so the data matrix streams from HBM exactly once per contraction and is
never copied.  (Rounding differs from explicit centering at the eps
level; the single-device parity paths keep explicit centering.)

``row_mask`` handles zero-padded rows (uneven sharding): products of the
form X·M pick up ``−μᵀM`` on padded rows from the broadcast term and
must be re-zeroed.
"""

from __future__ import annotations

import jax.numpy as jnp

from .linalg import mdot

__all__ = [
    "centered_matmul",
    "centered_rmatmul",
    "centered_gram",
    "centered_sqnorm",
    "centered_sqnorm_guarded",
]


def _mask_rows(y, n_valid: int | None):
    if n_valid is None or n_valid == y.shape[0]:
        return y
    mask = (jnp.arange(y.shape[0]) < n_valid)[:, None]
    return jnp.where(mask, y, 0)


def centered_matmul(x, m, means, n_valid: int | None = None):
    """``(X − 1μᵀ)·M`` without materializing the centered X.

    >>> import numpy as np, jax.numpy as jnp
    >>> x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 3)))
    >>> m = jnp.asarray(np.random.default_rng(1).normal(size=(3, 2)))
    >>> mu = jnp.mean(x, axis=0)
    >>> bool(np.allclose(centered_matmul(x, m, mu), (x - mu) @ m))
    True
    """
    y = mdot(x, m) - mdot(means, m)[None, :]
    return _mask_rows(y, n_valid)


def centered_rmatmul(x, q, means):
    """``(X − 1μᵀ)ᵀ·Q``.  ``q`` must already be zero on padded rows."""
    return mdot(x.conj().T, q) - jnp.outer(
        jnp.conj(means), jnp.sum(q, axis=0)
    )


def centered_gram(x, means, n: int):
    """``(X − 1μᵀ)ᵀ(X − 1μᵀ) = XᵀX − n·μμᵀ`` (padded rows of X are zero
    and contribute nothing to either term).

    >>> import numpy as np, jax.numpy as jnp
    >>> x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 3)))
    >>> mu = jnp.mean(x, axis=0)
    >>> xc = x - mu
    >>> bool(np.allclose(centered_gram(x, mu, 8), xc.T @ xc))
    True
    """
    return mdot(x.conj().T, x) - n * jnp.outer(jnp.conj(means), means)


def centered_sqnorm(x, means, n: int):
    """``‖X − 1μᵀ‖²_F = ‖X‖²_F − n·‖μ‖²``.

    >>> import numpy as np, jax.numpy as jnp
    >>> x = jnp.asarray(np.random.default_rng(3).normal(size=(8, 3)))
    >>> mu = jnp.mean(x, axis=0)
    >>> bool(np.allclose(centered_sqnorm(x, mu, 8),
    ...                  np.sum(np.asarray(x - mu) ** 2)))
    True
    """
    return jnp.sum(jnp.abs(x) ** 2) - n * jnp.sum(jnp.abs(means) ** 2)


# Mean-domination guard for the analytic total variance: subtracting
# n·‖μ‖² from ‖X‖²_F loses ~(1 + r) of the input grade at
# r = n·‖μ‖² / ‖Xc‖²_F — measured error ≈ 2·eps·(1 + r) (1.2e-5 at
# r = 87, f32).  The thresholds keep that under the dtype's parity band
# (1e-5 f32 / 1e-10 f64) with ~3× margin; past them the guarded form
# recomputes ‖X − 1μᵀ‖²_F explicitly (one extra data pass, engaged only
# when the data actually is mean-dominated).
_SQNORM_GUARD_RMAX = {"float32": 30.0, "float64": 3e4}


def guarded_sqnorm_from(sq, means, n: int, x, n_valid: int | None = None):
    """Total variance from a precomputed ``sq = ‖X‖²_F``: the analytic
    subtraction when safe, an explicit centered pass past the
    mean-domination threshold (in-graph ``lax.cond``)."""
    import jax

    msq = n * jnp.sum(jnp.abs(means) ** 2)
    tv = sq - msq
    rmax = _SQNORM_GUARD_RMAX[
        "float64" if jnp.real(means).dtype == jnp.float64 else "float32"
    ]
    r = msq / jnp.maximum(jnp.real(tv), jnp.asarray(1e-30, jnp.real(tv).dtype))

    def explicit(_):
        xc = _mask_rows(x - means, n_valid)
        return jnp.sum(jnp.abs(xc) ** 2)

    return jax.lax.cond(r > rmax, explicit, lambda _: tv, None)


def centered_sqnorm_guarded(x, means, n: int, n_valid: int | None = None):
    """``‖X − 1μᵀ‖²_F`` with the mean-domination guard (see
    :func:`guarded_sqnorm_from`)."""
    return guarded_sqnorm_from(
        jnp.sum(jnp.abs(x) ** 2), means, n, x, n_valid
    )
