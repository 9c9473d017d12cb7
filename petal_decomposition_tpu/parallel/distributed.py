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

Mean-centering is fused as a rank-1 correction into every contraction
(:mod:`..ops.centered`), so the data matrix is never copied and streams
from HBM exactly once per pass — the reference's explicit ``X − μ``
materialization (pca.rs:216,531) costs an extra n×d buffer + pass.
Set ``fuse_centering=False`` for bit-closer agreement with the explicit
paths.

Exact PCA at scale uses the Gram/eigh path: the reference's full
``gesvd`` materializes an m×m U (linalg.rs:85) and cannot scale past one
host's memory; the Gram path never forms anything larger than d×d +
the sharded thin U.  (Accuracy trade: singular values through the Gram
square to ~eps·κ(X)²; the single-device Jacobi path remains the 1e-10
parity route.)

``n_valid`` (static) supports zero-padded rows for uneven sharding:
means divide by the true count and every X·M product is re-zeroed on
padded rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.centered import (
    centered_gram,
    centered_matmul,
    centered_rmatmul,
    centered_sqnorm_guarded,
    guarded_sqnorm_from,
)
from ..ops.gram_recovery import (
    gram_subspace as _gram_subspace,
    randomized_gram_recovery,
)
from ..ops.linalg import (
    cholesky_qr2,
    eigh_psd_jit_cert,
    lu_pl,
    mdot,
    svd_flip,
    svd_jit_cert,
)
from ..utils import rng as rng_util

__all__ = [
    "pca_fit_gram",
    "randomized_pca_fit",
    "fast_ica_fit",
]


def _masked_center(x, centering: bool, n_valid: int | None):
    """Explicit (non-fused) centering with padded-row masking."""
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


def _contractions(x, centering: bool, n_valid: int | None,
                  fuse_centering: bool):
    """Returns ``(means, xm, xtm, gram, sqnorm)`` closures over the
    centered data, fused or explicit."""
    n = x.shape[0] if n_valid is None else n_valid
    if fuse_centering:
        if centering:
            means = jnp.sum(x, axis=0) / n
        else:
            means = jnp.zeros((x.shape[1],), x.dtype)
        return (
            means,
            lambda m: centered_matmul(x, m, means, n_valid),
            lambda q: centered_rmatmul(x, q, means),
            lambda: centered_gram(x, means, n),
            lambda: centered_sqnorm_guarded(x, means, n, n_valid),
        )
    means, xc = _masked_center(x, centering, n_valid)
    return (
        means,
        lambda m: mdot(xc, m),
        lambda q: mdot(xc.conj().T, q),
        lambda: mdot(xc.conj().T, xc),
        lambda: jnp.sum(jnp.abs(xc) ** 2),
    )


@partial(jax.jit, static_argnames=("centering", "n_valid", "fuse_centering",
                                   "cfg"))
def pca_fit_gram(x, *, centering: bool = True, n_valid: int | None = None,
                 fuse_centering: bool = True, cfg=None):
    """Exact PCA via the covariance eigenproblem.

    ``cfg`` is a jit-cache key only (config snapshot); unused in-body.

    ``C = XᵀX`` (one psum), ``eigh(C)`` replicated, thin
    ``U = X·V·σ⁻¹`` sharded.  Returns the same fields as the SVD path —
    U/σ/Vᵀ reproduce the full-SVD factorization including the
    deterministic ``svd_flip`` signs.
    """
    n = x.shape[0] if n_valid is None else n_valid
    d = x.shape[1]
    means, xm, _, gram, _ = _contractions(
        x, centering, n_valid, fuse_centering
    )
    with jax.named_scope("gram"):
        c = gram()  # (d, d), psum over the sample axis
    if fuse_centering and centering:
        # σ come straight from this Gram: the fused rank-1 centering
        # (XᵀX − n·μμᵀ) loses ~(1 + r) of the input grade at
        # r = n‖μ‖²/tr(C).  Unlike the range finder (where the Gram
        # only builds a subspace and recovery is quadratically
        # insensitive), the exact path reads σ² off this matrix, so it
        # uses the tight per-dtype thresholds of the total-variance
        # guard (measured: r ≈ 6.7e3 already costs 3.6e-4 relative σ
        # error at f32 `highest`); past them, rebuild from an
        # explicitly centered copy.
        from ..ops.centered import _SQNORM_GUARD_RMAX

        tr = jnp.real(jnp.trace(c))
        r = n * jnp.sum(jnp.abs(means) ** 2) / jnp.maximum(
            tr, jnp.asarray(1e-30, tr.dtype)
        )
        rmax = _SQNORM_GUARD_RMAX[
            "float64" if tr.dtype == jnp.float64 else "float32"
        ]

        def explicit(_):
            xc = _masked_center(x, centering, n_valid)[1]
            return mdot(xc.conj().T, xc)

        c = jax.lax.cond(r > rmax, explicit, lambda _: c, None)
    with jax.named_scope("eigh"):
        lam, v, off = eigh_psd_jit_cert(c)  # ascending
    lam = lam[::-1]
    v = v[:, ::-1]
    sigma = jnp.sqrt(jnp.maximum(lam, 0))
    inv_sigma = jnp.where(sigma > 0, 1.0 / jnp.where(sigma > 0, sigma, 1), 0)
    u = xm(v) * inv_sigma.astype(x.dtype)[None, :]  # sharded thin U
    u, vt = svd_flip(u, v.conj().T)
    k_full = min(n, d)
    return {
        "u": u[:, :k_full],
        "sigma": sigma[:k_full],
        "vt": vt[:k_full, :],
        "means": means,
        "total_variance": jnp.sum(sigma * sigma),
        # Convergence certificate of the d×d eigensolve; checked
        # host-side by the caller (LAPACK info != 0 analogue).
        "off": off,
    }


def _resolve_range_finder(range_finder: str, dtype, n: int, d: int,
                          l: int, *, full_f64: bool = False) -> str:
    """``"auto"`` picks the Gram finder on accelerators when the sketch
    is much narrower than the data (l ≤ d/4) and the data is tall
    (n ≥ 4d and ≥ 32k rows) — the regime where one compute-dense XᵀX
    pass replaces the 2·n_power_iters streaming passes of the direct
    finder.  CPU (reference parity) and complex dtypes stay direct.

    ``full_f64`` (finder runs at emulated f64, i.e. f64 data with
    ``finder_precision="full"``) also stays direct: the d²-deep Gram
    costs ~d/(3l) times the direct finder's flops, and every flop is
    emulated, so the Gram trade only pays when the finder drops to f32
    (the mixed path).  Measured on a v5e at 100k×1024 f64 l=42: the
    emulated-f64 Gram program additionally scheduled X-sized loop
    temps that exceeded HBM (16.04G > 15.75G, 47.7% fragmentation),
    while the direct finder fits and ran at 494 ms in round 2."""
    if range_finder != "auto":
        if range_finder == "gram" and jnp.issubdtype(
            jnp.dtype(dtype), jnp.complexfloating
        ):
            raise ValueError(
                "range_finder='gram' supports real dtypes only"
            )
        return range_finder
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        return "direct"
    if full_f64:
        return "direct"
    from ..ops.linalg import effective_platform

    if effective_platform() == "cpu":
        return "direct"
    if l >= 1 and l <= d // 4 and n >= 4 * d and n >= 32768:
        return "gram"
    return "direct"


def _resolve_gram_projection(gram_projection: str, range_finder: str,
                             mixed: bool) -> str:
    """``"auto"`` picks the zero-pass Gram-algebra recovery
    (``ops.gram_recovery.randomized_gram_recovery``) whenever the
    Gram range finder runs non-mixed on an accelerator —
    it removes BOTH per-fit data passes of the data-side recovery (the
    sketch ``Y = X·W`` and the projection ``B = QᵀX``), leaving one
    Gram+moments pass plus one thin-U pass.  Measured at the 1M×1024
    f32 flagship on v5e (same session, min of 5, one sigma-read sync):
    53.5 ms incl. the U pass vs 65.5 ms for the data-side recovery —
    ~1.5× on device time once the ~28 ms tunnel dispatch is
    subtracted (benchmarks/FLAGSHIP_PROBE.json; σ parity at the same
    key 6.9e-6).

    σ then carry the *Gram's* grade instead of the data projection's —
    for ``gram_precision="default"`` (one bf16 MXU pass) that is the
    grade the knob already documents: 9.8e-6 relative σ on an
    adversarial κ≈1e3 mean-dominated spectrum (benchmarks/
    GRAM_GRADE.json), inside the 1e-5 f32 band.  CPU keeps the
    data-side recovery (reference-parity grade at zero extra cost —
    LAPACK gemms are f32-true), as does the f64 mixed finder (its
    1e-10 σ contract *requires* projecting against the f64 data).
    """
    if gram_projection not in ("auto", "data", "gram"):
        raise ValueError(f"unknown gram projection {gram_projection!r}")
    if gram_projection == "gram":
        if range_finder != "gram":
            raise ValueError(
                "gram_projection='gram' requires range_finder='gram'"
            )
        if mixed:
            raise ValueError(
                "gram_projection='gram' cannot honor the mixed f64 "
                "finder's 1e-10 sigma contract (sigma would be capped "
                "at the f32 Gram grade); use gram_projection='data'"
            )
        return "gram"
    if gram_projection == "data":
        return "data"
    from ..ops.linalg import effective_platform

    if (
        range_finder == "gram"
        and not mixed
        and effective_platform() != "cpu"
    ):
        return "gram"
    return "data"


# Mean-cancellation guard thresholds per Gram precision: the fused
# uncentered Gram subtracts n·μμᵀ, losing ~(1 + r) of its input grade
# where r = n‖μ‖²/tr(Gc); beyond these ratios the subspace operator is
# recomputed from an explicitly centered copy (3 HBM passes, engaged
# only when the data actually is mean-dominated).
_GRAM_GUARD_RMAX = {"default": 2.0, "high": 1e3, "highest": 1e5}


def _gram_of(xc, precision: str):
    """``XᵀX`` at the requested matmul precision (f32/f64 input).

    ``"default"`` on TPU f32 is the documented bf16-grade mode
    (the ``_GRAM_GUARD_RMAX`` rating and the Pallas fused kernel both
    assume one bf16 MXU pass with f32 accumulation).  It is cast
    explicitly because current libtpu lowers a plain
    ``precision="default"`` f32 dot to THREE bf16 passes — measured
    3.1× slower at 65k×4096 (43 → 14 ms/block) for accuracy the grade
    never promised; explicit bf16 operands restore the single pass and
    keep non-fused fits consistent with the fused kernel's arithmetic.
    The gate is TPU-only: it fixes a *TPU lowering* quirk, and on
    other platforms (CPU, GPU) ``"default"`` f32 is a true f32 GEMM
    that an unconditional bf16 cast would silently downgrade.
    """
    from ..ops.linalg import effective_platform

    if (
        precision == "default"
        and xc.dtype == jnp.float32
        and effective_platform() == "tpu"
    ):
        x16 = xc.astype(jnp.bfloat16)
        return jnp.dot(
            x16.T, x16, preferred_element_type=jnp.float32
        )
    return jnp.dot(xc.conj().T, xc, precision=precision)


def _gram_moments(x, centering: bool, n_valid: int | None,
                  fuse_centering: bool, gram_precision: str, n: int):
    """``(means, G_centered, total_variance)`` for the Gram range finder
    (real f32/f64 data; padded rows must be zero).

    The three reductions (Gram at ``gram_precision``, column sums,
    ‖X‖²_F) are written as siblings over one buffer: XLA multi-output-
    fuses the two VPU reductions into one extra pass over the Gram's
    read (measured on v5e: gram-only 8.7 ms vs all-three 14.3 ms at
    1M×1024 f32 — a hand-written Pallas single-pass kernel measured
    21.5 ms, LOSING to XLA's emitters at every block size, and was
    removed; benchmarks/ROOFLINE.json + DESIGN.md §7 record the data).
    GSPMD shards all three under a mesh.

    With fused centering the centered Gram is formed as
    ``XᵀX − n·μμᵀ``, which loses ~(1 + r) of the Gram's input grade at
    r = n‖μ‖²/tr(Gc); past the per-precision threshold the subspace
    operator is recomputed from an explicitly centered copy
    (``lax.cond`` — extra passes only when the data is mean-dominated).
    """
    rmax = _GRAM_GUARD_RMAX[gram_precision]

    def _guarded(g_raw, means):
        g_sub = g_raw - n * jnp.outer(jnp.conj(means), means)
        if not centering:
            return g_sub
        r = n * jnp.sum(jnp.abs(means) ** 2) / jnp.maximum(
            jnp.trace(g_sub), jnp.asarray(1e-30, g_sub.dtype)
        )

        def explicit(_):
            xc = _masked_center(x, centering, n_valid)[1]
            return _gram_of(xc, gram_precision)

        return jax.lax.cond(r > rmax, explicit, lambda _: g_sub, None)

    if fuse_centering:
        d = x.shape[1]
        if centering:
            means = jnp.sum(x, axis=0) / n
        else:
            means = jnp.zeros((d,), x.dtype)
        tv = centered_sqnorm_guarded(x, means, n, n_valid)
        with jax.named_scope("gram"):
            g_raw = _gram_of(x, gram_precision)
        return means, _guarded(g_raw, means), tv
    means, xc = _masked_center(x, centering, n_valid)
    tv = jnp.sum(jnp.abs(xc) ** 2)
    with jax.named_scope("gram"):
        g_sub = _gram_of(xc, gram_precision)
    return means, g_sub, tv


def _fused_gram_flow(x, omega, centering: bool, n_power_iters: int,
                     gram_precision: str, n: int,
                     n_valid: int | None = None, kernel_mesh=None):
    """Gram range finder with the fused sketch+moments Pallas kernel
    (real f32; single-device, or per-shard when ``kernel_mesh`` is a
    mesh): ``(means, total_variance, Y)``.  Zero-padded rows (uneven
    sharding, ``n_valid``) contribute nothing to the kernel's outputs;
    only the appended ones column and the guard's explicit centering
    need re-masking.

    The subspace iteration runs on the RAW Gram ``XᵀX`` — so the means
    are not needed before the sketch and can ride the sketch pass
    inside the kernel.  Raw-Gram subspace is exactly as good as the
    centered one here: ``XᵀX = XcᵀXc + n·μμᵀ`` is a rank-1 perturbation
    whose extra eigendirection costs at most one basis column, and the
    appended ones column restores exact coverage of the centering
    correction — ``span{X·W, 1} ⊇ span{(X − 1μᵀ)·W}`` for any μ.  The
    recovery still projects against the exact data, so σ error stays
    quadratic in basis error.  Past the bf16 mean-domination threshold
    (`_GRAM_GUARD_RMAX`) an in-graph ``lax.cond`` redoes the operator,
    subspace, and sketch from an explicitly centered copy.
    """
    from ..ops.pallas.sketch_kernel import fused_sketch_moments_on

    with jax.named_scope("gram"):
        g_raw = _gram_of(x, gram_precision)
    w = _gram_subspace(g_raw, omega, n_power_iters)
    with jax.named_scope("sketch_moments"):
        y_raw, colsum, sq = fused_sketch_moments_on(x, w, kernel_mesh)
    if not centering:
        means = jnp.zeros((x.shape[1],), x.dtype)
        return means, sq, y_raw
    means = colsum / n
    msq = n * jnp.sum(means * means)
    # ‖X − 1μᵀ‖²_F = ‖X‖²_F − n‖μ‖², cancellation-guarded: tv is
    # user-visible (explained-variance denominators), so the analytic
    # subtraction alone is not enough on mean-dominated data.
    tv = guarded_sqnorm_from(sq, means, n, x, n_valid)
    if n_valid is not None and n_valid != x.shape[0]:
        ones_col = (
            jnp.arange(x.shape[0]) < n_valid
        ).astype(x.dtype)[:, None]
    else:
        ones_col = jnp.ones((x.shape[0], 1), x.dtype)

    def fast(_):
        corr = mdot(means[None, :], w)[0]
        # The masked ones column also re-zeroes the rank-1 centering
        # correction on padded rows (y_raw is already zero there).
        return jnp.concatenate(
            [y_raw - jnp.outer(ones_col[:, 0], corr), ones_col], axis=1
        )

    def explicit(_):
        xc = x - means
        if n_valid is not None and n_valid != x.shape[0]:
            mask = (jnp.arange(x.shape[0]) < n_valid)[:, None]
            xc = jnp.where(mask, xc, 0)
        g_e = _gram_of(xc, gram_precision)
        w_e = _gram_subspace(g_e, omega, n_power_iters)
        return jnp.concatenate([mdot(xc, w_e), ones_col], axis=1)

    r = msq / jnp.maximum(tv, jnp.asarray(1e-30, tv.dtype))
    q = jax.lax.cond(
        r > _GRAM_GUARD_RMAX[gram_precision], explicit, fast, None
    )
    return means, tv, q


@partial(
    jax.jit,
    static_argnames=(
        "n_components",
        "centering",
        "n_oversamples",
        "n_power_iters",
        "normalizer",
        "n_valid",
        "fuse_centering",
        "final_orth",
        "finder_precision",
        "range_finder",
        "gram_precision",
        "gram_projection",
        "fused_sketch",
        "kernel_mesh",
        "cfg",
    ),
)
def randomized_pca_fit(x, key, *, n_components: int, centering: bool = True,
                       n_oversamples: int = 10, n_power_iters: int = 7,
                       normalizer: str = "cholqr2",
                       n_valid: int | None = None,
                       fuse_centering: bool = True,
                       final_orth: str = "auto",
                       finder_precision: str = "full",
                       range_finder: str = "direct",
                       gram_precision: str = "auto",
                       gram_projection: str = "auto",
                       fused_sketch: bool = False,
                       kernel_mesh=None, cfg=None):
    """Halko randomized SVD as one sharded XLA computation.

    Mirrors the single-device pipeline (pca.rs:665-718) with the
    matmul-only CholeskyQR2 as the default normalizer: the only
    cross-shard dependencies per power iteration are two psums of
    (k+10)-wide Gram matrices riding ICI.  With fused centering the
    n×d data streams from HBM exactly ``2·n_power_iters + 2`` times and
    is never copied.

    ``finder_precision`` (static): precision of the *range finder* (the
    sketch + power-iteration gemms, 15 of the pipeline's 16 passes over
    the data):

    * ``"full"``  — everything at the data dtype (reference-faithful).
    * ``"f32"``   — the finder runs in float32 on the MXU; the final
      orthonormalization, projection ``B = QᴴX``, SVD of B, and
      ``U = Q·U_B`` recovery stay at the data dtype.  The finder only
      constructs a subspace; Rayleigh–Ritz recovery makes the singular
      values *quadratically* insensitive to its error (sin²θ ≈ 1e-12
      for an f32-grade basis), so f64 fits keep ~1e-10 σ accuracy while
      skipping XLA's ~8× slower per-gemm f64 emulation.  (Measured on
      v5e: the 100k×1024 f64 skinny gemm runs 121 Gflop/s emulated vs
      882 Gflop/s in f32.)  Requires |x| within float32 range.
    * ``"auto"``  — ``"f32"`` for float64 data on an accelerator
      backend, ``"full"`` otherwise (CPU LAPACK-grade f64 gemms are
      already fast; complex stays full).

    ``range_finder`` (static): how the orthonormal range basis Q is
    constructed:

    * ``"direct"`` — the reference's streaming power iteration
      (pca.rs:689-718): 2·n_power_iters + 1 full passes over the data.
    * ``"gram"``   — one compute-dense pass builds ``G = XᵀX``; the
      power iterations then run on the d×d operator (tiny d×d×l
      matmuls, zero data passes) and one more pass forms
      ``Y = X·qr(GᑫΩ)``.  Identical subspace — ``range(X(XᵀX)ᑫΩ)`` —
      in ~3 data passes instead of 2q+2.  The recovery (``B = QᴴX``,
      SVD of B) still projects against the EXACT data, so singular
      values are quadratically insensitive to Gram-precision error.
      The column sums and ‖X‖²_F ride the Gram pass as XLA-sibling-
      fused reductions (see :func:`_gram_moments`).
    * ``"auto"``  — see :func:`_resolve_range_finder`.

    ``gram_projection`` (static, Gram finder only): how the recovery
    (B = QᵀX, SVD of B — pca.rs:681-684) is evaluated:

    * ``"data"`` — project against the exact data (one sketch pass +
      one projection pass); σ quadratically insensitive to Gram error.
    * ``"gram"`` — reconstruct the identical recovery from Gc's l×l
      algebra (``ops.gram_recovery.randomized_gram_recovery``) with
      ZERO data passes, then recover the thin U in one fused centered
      matmul; σ carry the Gram's grade (for
      ``gram_precision="default"``: 9.8e-6 adversarial relative σ,
      benchmarks/GRAM_GRADE.json).
    * ``"auto"`` — see :func:`_resolve_gram_projection`.

    ``fused_sketch`` (static): allow the fused sketch+moments Pallas
    kernel on the Gram-finder path (real f32 at
    ``gram_precision="default"``).  Callers must have verified
    ``sketch_kernel.kernel_available()`` eagerly; the flag is refined
    in-trace by ``sketch_kernel.supports`` on the per-shard row count.

    ``kernel_mesh`` (static): the mesh for a SHARDED fit that wants the
    fused kernel per shard via ``shard_map`` (``None`` = single
    device).  A static argument — not the ambient
    ``replicated_kernel_mesh`` context — so the jit cache can never
    reuse a bare-``pallas_call`` trace inside a GSPMD program (a bare
    kernel has no partitioning rule).  Callers must have verified
    ``sketch_kernel.mesh_kernel_available(mesh)`` eagerly.

    ``gram_precision`` (static): matmul precision of the Gram pass
    (``"default"`` = bf16 inputs / f32 accumulate, ``"high"``,
    ``"highest"``).  ``"auto"`` = ``"default"`` for f32 data (subspace-
    grade only; guarded — see ``_GRAM_GUARD_RMAX``) and ``"highest"``
    for the float64 mixed finder (keeps the f32-grade basis the 1e-10
    σ-accuracy argument needs).
    """
    n = x.shape[0] if n_valid is None else n_valid
    d = x.shape[1]
    means, xm, xtm, _, sqnorm = _contractions(
        x, centering, n_valid, fuse_centering
    )
    l = min(n_components + n_oversamples, n, d)
    if finder_precision == "auto":
        from ..ops.linalg import effective_platform

        finder_precision = (
            "f32"
            if x.dtype == jnp.float64 and effective_platform() != "cpu"
            else "full"
        )
    # Mixed mode is float64-only: casting complex data to float32
    # would silently discard the imaginary half of the sketch.
    mixed = finder_precision == "f32" and x.dtype == jnp.float64
    if gram_projection == "gram" and range_finder == "auto":
        # An explicitly pinned Gram-algebra recovery implies the Gram
        # finder (the complex-dtype check in _resolve_range_finder
        # still applies).
        range_finder = "gram"
    range_finder = _resolve_range_finder(
        range_finder, x.dtype, n, d, l,
        full_f64=x.dtype == jnp.float64 and not mixed,
    )
    if gram_precision == "auto":
        gram_precision = "highest" if mixed else "default"
    gram_projection = _resolve_gram_projection(
        gram_projection, range_finder, mixed
    )
    if range_finder == "gram" and gram_projection == "gram":
        # Zero-pass recovery: no sketch, no data projection — the
        # whole randomized SVD runs on Gc's l×l algebra, then ONE
        # fused centered matmul recovers the thin U (needed for the
        # reference-exact U-based svd_flip, pca.rs:815-850, and for
        # fit_transform).  See _resolve_gram_projection for the
        # measured trade.
        means, g_sub, tv = _gram_moments(
            x, centering, n_valid, fuse_centering, gram_precision, n
        )
        with jax.named_scope("gram_recovery"):
            sigma, vt, off = randomized_gram_recovery(
                g_sub, rng_util.normal(key, (d, l), x.dtype),
                n_power_iters=n_power_iters, cfg=cfg,
            )
        inv_sigma = jnp.where(
            sigma > 0, 1.0 / jnp.where(sigma > 0, sigma, 1), 0
        )
        with jax.named_scope("recover_u"):
            # U = Xc·V·Σ⁻¹ (zero columns where σ was cut to 0 — the
            # rank-deficient directions transform to exact zeros).
            u = centered_matmul(
                x, (vt.conj().T * inv_sigma[None, :]).astype(x.dtype),
                means, n_valid,
            )
        u, vt = svd_flip(u, vt)
        return {
            "u": u,
            "sigma": sigma,
            "vt": vt,
            "means": means,
            "total_variance": tv,
            "off": off,
        }
    tv = None  # total variance; None → sqnorm() pass at the end

    def norm(m):
        if normalizer == "lu":
            return lu_pl(m)
        if normalizer == "qr":
            return jnp.linalg.qr(m, mode="reduced")[0]
        if normalizer == "cholqr2":
            return cholesky_qr2(m)
        return m

    omega = rng_util.normal(key, (d, l), x.dtype)
    if mixed:
        f32 = jnp.float32
        with jax.named_scope("downcast_center"):
            # One pass: read x, write the centered f32 copy the finder
            # iterates on (padded rows re-zeroed).
            xc32 = x.astype(f32) - means.astype(f32) if centering else (
                x.astype(f32)
            )
            if n_valid is not None:
                mask = (jnp.arange(x.shape[0]) < n_valid)[:, None]
                xc32 = jnp.where(mask, xc32, 0)
        if range_finder == "gram":
            with jax.named_scope("gram"):
                g_sub = _gram_of(xc32, gram_precision)
            w = _gram_subspace(g_sub, omega.astype(f32), n_power_iters)
            with jax.named_scope("sketch"):
                q = mdot(xc32, w)
        else:
            with jax.named_scope("sketch"):
                q = mdot(xc32, omega.astype(f32))  # (n, l) sharded
            for it in range(n_power_iters):
                with jax.named_scope(f"power_iter_{it}"):
                    q = mdot(xc32.conj().T, norm(q))  # (d, l) replicated
                    q = mdot(xc32, norm(q))  # (n, l) sharded
        q = q.astype(x.dtype)
    elif range_finder == "gram":
        from ..ops.pallas import sketch_kernel

        # Under a mesh the kernel runs per shard: gate on the per-shard
        # row count (shard_rows_padded guarantees evenness).
        rows = (
            x.shape[0]
            if kernel_mesh is None
            else x.shape[0] // kernel_mesh.size
        )
        use_fused = (
            fused_sketch
            and fuse_centering
            and gram_precision == "default"
            and x.dtype == jnp.float32
            and sketch_kernel.supports(rows, d, l, x.dtype)
        )
        if use_fused:
            means, tv, q = _fused_gram_flow(
                x, omega, centering, n_power_iters, gram_precision, n,
                n_valid, kernel_mesh,
            )
        else:
            means, g_sub, tv = _gram_moments(
                x, centering, n_valid, fuse_centering, gram_precision, n
            )
            w = _gram_subspace(g_sub, omega, n_power_iters)
            with jax.named_scope("sketch"):
                # Works for every centering/fusion combination: means
                # are exact and zero when centering is off.
                q = centered_matmul(x, w, means, n_valid)
    else:
        with jax.named_scope("sketch"):
            q = xm(omega)  # (n, l) sharded
        for it in range(n_power_iters):
            with jax.named_scope(f"power_iter_{it}"):
                q = xtm(norm(q))  # (d, l) replicated (psum)
                q = xm(norm(q))  # (n, l) sharded
    # Final orthonormalization: Householder QR matches the reference's
    # economy-QR semantics (linalg.rs:127-147); CholeskyQR2 is the
    # matmul-only choice for sharded fits.  Always at the data dtype.
    if final_orth == "auto":
        final_orth = "qr" if normalizer == "qr" else "cholqr2"
    with jax.named_scope("orthonormalize"):
        q = jnp.linalg.qr(q, mode="reduced")[0] if final_orth == "qr" else (
            cholesky_qr2(q)
        )
    if range_finder == "gram" and not mixed:
        # Projection with the gram-branch means (identical values; the
        # closure means may come from the fused kernel's column sums).
        with jax.named_scope("project"):
            b = centered_rmatmul(x, q, means).conj().T
    else:
        with jax.named_scope("project"):
            b = xtm(q).conj().T  # (l, d) replicated: Qᴴ·Xc via one psum
    with jax.named_scope("svd_b"):
        u_b, sigma, vt, off = svd_jit_cert(b)
    if q.shape[1] > l:
        # The fused-kernel path widened Q with the ones (centering)
        # column; its singular direction is ~0 and sorts last.  Drop it
        # so fused and non-fused fits install identically-shaped state
        # (sigma/_singular_full/u widths must not depend on whether the
        # Pallas kernel probe succeeded).
        u_b, sigma, vt = u_b[:, :l], sigma[:l], vt[:l]
    with jax.named_scope("recover_u"):
        u = mdot(q, u_b)  # (n, l) sharded
    u, vt = svd_flip(u, vt)
    return {
        "u": u,
        "sigma": sigma,
        "vt": vt,
        "means": means,
        "total_variance": sqnorm() if tv is None else tv,
        # Certificate of the (k+10)×d projected SVD (the pipeline's only
        # iterative factorization); checked host-side by the caller.
        "off": off,
    }


@partial(jax.jit, static_argnames=("fun", "max_iter", "n_valid",
                                   "fuse_centering", "n_components",
                                   "whiten",
                                   "decorrelation", "precision", "cfg"))
def fast_ica_fit(x, key, *, fun: str = "logcosh", tol: float = 1e-4,
                 max_iter: int = 200, n_valid: int | None = None,
                 fuse_centering: bool = True,
                 n_components: int | None = None,
                 whiten: bool = True,
                 decorrelation: str = "eigh",
                 precision: str = "full", cfg=None):
    """FastICA with Gram/eigh whitening as one sharded XLA computation.

    Whitening reduces over samples once (d×d psum); each ``ica_par``
    step reduces the k×n whitened data against Gᵀ (psum) and solves the
    replicated k×k decorrelation eigenproblem on every device.

    ``whiten=False`` (static): the caller certifies pre-centered,
    pre-whitened data — no centering, no whitening solve; ``ica_par``
    runs on the sharded Xᵀ directly and ``components`` is the square
    unmixing W (sklearn semantics; see ``FastIca._fit_no_whiten``).
    """
    from ..models._common import real_dtype as _real_dtype_of
    from ..models.fast_ica import _ica_par_core

    n = x.shape[0] if n_valid is None else n_valid
    d = x.shape[1]
    if not whiten:
        real = _real_dtype_of(x.dtype)
        w_init = rng_util.normal(key, (d, d), x.dtype)
        with jax.named_scope("ica_par"):
            w, lim, n_iter = _ica_par_core(
                x.T, jnp.asarray(tol, real), max_iter, w_init, fun,
                n_valid=n_valid, decorrelation=decorrelation,
                precision=precision, cfg=cfg,
            )
        from ..models.fast_ica import decorrelation_certificate

        return {
            "components": w,
            "means": jnp.zeros((d,), real),
            "n_iter": n_iter,
            "lim": lim,
            "off": jnp.zeros((), real),
            "w_orth_err": decorrelation_certificate(w),
        }
    k = min(n, d) if n_components is None else min(n_components, n, d)
    means, xm, _, gram, _ = _contractions(x, True, n_valid, fuse_centering)
    with jax.named_scope("whiten_gram"):
        c = gram()  # (d, d) psum
    with jax.named_scope("whiten_eigh"):
        lam, v, whiten_off = eigh_psd_jit_cert(c)
    lam = lam[::-1][:k]
    v_k = v[:, ::-1][:, :k]
    sigma = jnp.sqrt(jnp.maximum(lam, 0))
    # Relative cutoff: degenerate directions whiten to zero (same
    # √-scaled rank tolerance as models.fast_ica._whitening_matrix —
    # a linear max(n, d) factor over-prunes f32 fits at large n).
    cutoff = sigma[0] * jnp.finfo(sigma.dtype).eps * max(
        10.0, 4.0 * max(n, d) ** 0.5
    )
    ok = sigma > cutoff
    inv_sigma = jnp.where(ok, 1.0 / jnp.where(ok, sigma, 1), 0)
    kmat = (v_k * inv_sigma.astype(v_k.dtype)[None, :]).T  # (k, d) replicated
    # X₁ = K·Xᵀ·√n, computed sharded-first: (X·V·σ⁻¹)ᵀ·√n
    y1 = xm(v_k) * inv_sigma.astype(x.dtype)[None, :]
    x1 = (y1 * jnp.sqrt(jnp.asarray(n, x.dtype))).T  # (k, n) col-sharded

    w_init = rng_util.normal(key, (k, k), x.dtype)
    with jax.named_scope("ica_par"):
        w, lim, n_iter = _ica_par_core(
            x1, jnp.asarray(tol, _real_dtype_of(x.dtype)), max_iter,
            w_init, fun,
            n_valid=n_valid,
            decorrelation=decorrelation, precision=precision, cfg=cfg,
        )
    components = mdot(w, kmat)  # (k, d) replicated
    # Decorrelation certificate (projector test — see
    # models.fast_ica.decorrelation_certificate): W·Wᴴ must satisfy
    # G² = G, allowing dead directions when rank(X) < k; per-iteration
    # k×k eigensolves inside the while_loop cannot surface individual
    # certificates, but any failure shows up here.
    from ..models.fast_ica import decorrelation_certificate

    w_orth_err = decorrelation_certificate(w)
    return {
        "components": components,
        "means": means,
        "n_iter": n_iter,
        "lim": lim,
        "off": whiten_off,
        "w_orth_err": w_orth_err,
    }
