"""Row-sharded (distributed) fit pipelines.

Each fit here is ONE jitted XLA computation over a row-sharded data
matrix: GSPMD turns every sample-axis contraction into a local MXU
matmul followed by a ``psum`` over ICI, per SURVEY §2.3's mapping of the
reference call stacks to collectives:

* mean over samples       → ``psum(Σ local rows)/n``  (replaces pca.rs:207/521)
* Gram/covariance ``XᵀX`` → local matmul + psum       (replaces pca.rs:216-219)
* sketch ``X·Ω`` / ``XᵀY``→ sharded matmul + psum     (replaces pca.rs:707-714)
* projection ``QᵀX``      → psum                      (replaces pca.rs:681)
* ICA ``G·Xᵀ``            → psum                      (replaces ica.rs:332-342)

The k×k / d×d factorizations (eigh, small SVD) operate on replicated
post-psum matrices.  No hand-written collectives: the sharding
annotations on the inputs are the whole distributed programming model.

Exact PCA at scale uses the Gram/eigh path: the reference's full
``gesvd`` materializes an m×m U (linalg.rs:85) and cannot scale past one
host's memory; the Gram path never forms anything larger than d×d +
the sharded thin U.  (Accuracy trade: singular values through the Gram
square to ~eps·κ(X)²; the single-device Jacobi path remains the 1e-10
parity route.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.linalg import (
    cholesky_qr2,
    eigh_jit,
    lu_pl,
    mdot,
    svd_flip,
    svd_jit,
)
from ..utils import rng as rng_util

__all__ = [
    "pca_fit_gram",
    "randomized_pca_fit",
    "fast_ica_fit",
]


def _center(x, centering: bool, n_valid: int | None = None):
    """Mean-center with optional padded-row masking.

    When ``x`` carries zero rows appended for even sharding
    (``n_valid < x.shape[0]``), the mean divides by the true row count
    and the centered matrix is re-zeroed on padded rows so every
    downstream contraction (Gram, sketch, projection) ignores them.
    """
    n = x.shape[0] if n_valid is None else n_valid
    if centering:
        means = jnp.sum(x, axis=0) / n  # padded rows are zeros
        xc = x - means
    else:
        means = jnp.zeros((x.shape[1],), x.dtype)
        xc = x
    if n != x.shape[0]:
        mask = (jnp.arange(x.shape[0]) < n)[:, None]
        xc = jnp.where(mask, xc, 0)
    return means, xc


@partial(jax.jit, static_argnames=("centering", "n_valid"))
def pca_fit_gram(x, *, centering: bool = True, n_valid: int | None = None):
    """Exact PCA via the covariance eigenproblem.

    ``C = XᵀX`` (one psum), ``eigh(C)`` replicated, thin
    ``U = X·V·σ⁻¹`` sharded.  Returns the same fields as the SVD path —
    U/σ/Vᵀ reproduce the full-SVD factorization including the
    deterministic ``svd_flip`` signs.
    """
    n, d = (x.shape[0] if n_valid is None else n_valid), x.shape[1]
    means, xc = _center(x, centering, n_valid)
    c = mdot(xc.conj().T, xc)  # (d, d), psum over the sample axis
    lam, v = eigh_jit(c)  # ascending
    lam = lam[::-1]
    v = v[:, ::-1]
    sigma = jnp.sqrt(jnp.maximum(lam, 0))
    inv_sigma = jnp.where(sigma > 0, 1.0 / jnp.where(sigma > 0, sigma, 1), 0)
    u = mdot(xc, v) * inv_sigma.astype(xc.dtype)[None, :]  # sharded thin U
    u, vt = svd_flip(u, v.conj().T)
    k_full = min(n, d)
    return {
        "u": u[:, :k_full],
        "sigma": sigma[:k_full],
        "vt": vt[:k_full, :],
        "means": means,
        "total_variance": jnp.sum(sigma * sigma),
    }


@partial(
    jax.jit,
    static_argnames=(
        "n_components",
        "centering",
        "n_oversamples",
        "n_power_iters",
        "normalizer",
        "n_valid",
    ),
)
def randomized_pca_fit(x, key, *, n_components: int, centering: bool = True,
                       n_oversamples: int = 10, n_power_iters: int = 7,
                       normalizer: str = "cholqr2",
                       n_valid: int | None = None):
    """Halko randomized SVD as one sharded XLA computation.

    Mirrors the single-device pipeline (pca.rs:665-718) with the
    matmul-only CholeskyQR2 as the default normalizer: the only
    cross-shard dependencies per power iteration are two psums of
    (k+10)-wide Gram matrices riding ICI.
    """
    n, d = (x.shape[0] if n_valid is None else n_valid), x.shape[1]
    means, xc = _center(x, centering, n_valid)
    l = min(n_components + n_oversamples, n, d)

    def norm(m):
        if normalizer == "lu":
            return lu_pl(m)
        if normalizer == "qr":
            return jnp.linalg.qr(m, mode="reduced")[0]
        if normalizer == "cholqr2":
            return cholesky_qr2(m)
        return m

    omega = rng_util.normal(key, (d, l), x.dtype)
    q = mdot(xc, omega)  # (n, l) sharded
    for _ in range(n_power_iters):
        q = mdot(xc.conj().T, norm(q))  # (d, l) replicated (psum)
        q = mdot(xc, norm(q))  # (n, l) sharded
    q = cholesky_qr2(q) if normalizer != "qr" else norm(q)
    b = mdot(q.conj().T, xc)  # (l, d) replicated (psum)
    u_b, sigma, vt = svd_jit(b)
    u = mdot(q, u_b)  # (n, l) sharded
    u, vt = svd_flip(u, vt)
    return {
        "u": u,
        "sigma": sigma,
        "vt": vt,
        "means": means,
        "total_variance": jnp.sum(jnp.abs(xc) ** 2),
    }


@partial(jax.jit, static_argnames=("fun", "max_iter", "n_valid"))
def fast_ica_fit(x, key, *, fun: str = "logcosh", tol: float = 1e-4,
                 max_iter: int = 200, n_valid: int | None = None):
    """FastICA with Gram/eigh whitening as one sharded XLA computation.

    Whitening reduces over samples once (d×d psum); each ``ica_par``
    step reduces the k×n whitened data against Gᵀ (psum) and solves the
    replicated k×k decorrelation eigenproblem on every device.
    """
    from ..models.fast_ica import _ica_par_core

    n, d = (x.shape[0] if n_valid is None else n_valid), x.shape[1]
    k = min(n, d)
    means, xc = _center(x, True, n_valid)
    c = mdot(xc.conj().T, xc)  # (d, d) psum
    lam, v = eigh_jit(c)
    lam = lam[::-1][:k]
    v_k = v[:, ::-1][:, :k]
    sigma = jnp.sqrt(jnp.maximum(lam, 0))
    inv_sigma = jnp.where(sigma > 0, 1.0 / jnp.where(sigma > 0, sigma, 1), 0)
    kmat = (v_k * inv_sigma.astype(v_k.dtype)[None, :]).T  # (k, d) replicated
    # X₁ = K·Xᵀ·√n, computed sharded-first: (X·V·σ⁻¹)ᵀ·√n
    y1 = mdot(xc, v_k) * inv_sigma.astype(xc.dtype)[None, :]
    x1 = (y1 * jnp.sqrt(jnp.asarray(n, x.dtype))).T  # (k, n) col-sharded

    w_init = rng_util.normal(key, (k, k), x.dtype)
    w, lim, n_iter = _ica_par_core(
        x1, jnp.asarray(tol, jnp.real(x).dtype), max_iter, w_init, fun,
        n_valid=None if n_valid is None else n_valid,
    )
    components = mdot(w, kmat)  # (k, d) replicated
    return {
        "components": components,
        "means": means,
        "n_iter": n_iter,
        "lim": lim,
    }
