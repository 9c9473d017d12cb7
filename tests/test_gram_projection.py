"""Gram-algebra recovery for the in-core Gram range finder.

``gram_projection="gram"`` reconstructs the data-side recovery
(B = QᵀX, SVD of B — pca.rs:681-684) from Gc's l×l algebra
(``ops.gram_recovery.randomized_gram_recovery``) with zero extra data
passes, then recovers the thin U in one fused centered matmul so the
reference-exact U-based ``svd_flip`` (pca.rs:815-850) and
``fit_transform`` semantics are preserved.  On CPU both paths run
true-f32/f64 matmuls, so they must agree to working precision on
spectra whose singular vectors are well determined.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from petal_decomposition_tpu import RandomizedPca, RandomizedPcaBuilder
from petal_decomposition_tpu.parallel import make_mesh
from petal_decomposition_tpu.parallel.distributed import (
    _resolve_gram_projection,
    randomized_pca_fit,
)
from petal_decomposition_tpu.utils.rng import key_from_seed

RNG_SEED = 1_234_567_891_011_121_314  # ref: pca.rs:860


def _data(n=3000, d=128, dtype=np.float32, offset=0.3, kappa=1e3):
    """Geometrically decaying spectrum: singular VECTORS are well
    separated, so the two recoveries must agree vector-wise (a flat
    Gaussian spectrum only pins σ, not the vectors)."""
    rng = np.random.default_rng(7)
    spec = np.geomspace(1.0, 1.0 / kappa, d)
    x = rng.standard_normal((n, d)) * spec
    return (x + offset).astype(dtype)


def _fit_pair(x, k=8, **kw):
    a = RandomizedPca(
        k, seed=RNG_SEED, range_finder="gram", gram_projection="data", **kw
    ).fit(x)
    b = RandomizedPca(
        k, seed=RNG_SEED, range_finder="gram", gram_projection="gram", **kw
    ).fit(x)
    return a, b


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_gram_projection_matches_data_path(dtype):
    x = _data(dtype=dtype)
    a, b = _fit_pair(x)
    sa = np.asarray(a.singular_values_)
    sb = np.asarray(b.singular_values_)
    tol = 5e-5 if dtype == np.float32 else 1e-11
    assert np.max(np.abs(sa - sb) / sa) < tol
    ca, cb = np.asarray(a.components_), np.asarray(b.components_)
    vtol = 1e-3 if dtype == np.float32 else 1e-8
    # Signs must match too (both paths use the U-based svd_flip).
    assert np.max(np.abs(ca - cb)) < vtol


def test_gram_projection_f64_sigma_vs_reference():
    """f64 σ against the exact SVD: the gram recovery must not degrade
    the randomized pipeline's own truncation grade (the residual ~1e-9
    here is subspace truncation at q=7 on a κ=1e3 spectrum — shared by
    both recoveries — not Gram-algebra error)."""
    x = _data(dtype=np.float64)
    a, b = _fit_pair(x)
    s_ref = np.linalg.svd(x - x.mean(0), compute_uv=False)[:8]
    err_data = np.max(
        np.abs(np.asarray(a.singular_values_) - s_ref) / s_ref
    )
    err_gram = np.max(
        np.abs(np.asarray(b.singular_values_) - s_ref) / s_ref
    )
    assert err_gram < 1e-8
    assert err_gram < 3 * err_data + 1e-12


def test_gram_projection_fit_transform_consistency():
    """U recovered as Xc·V·Σ⁻¹ makes fit_transform = U·Σ = Xc·V =
    transform(x): both the identity and its grade must hold."""
    x = _data(dtype=np.float64)
    m = RandomizedPca(
        6, seed=RNG_SEED, range_finder="gram", gram_projection="gram"
    )
    y_ft = np.asarray(m.fit_transform(x))
    y_t = np.asarray(m.transform(x))
    assert np.max(np.abs(y_ft - y_t)) < 1e-9 * np.max(np.abs(y_t))


def test_gram_projection_mean_dominated_guard():
    """offset ≫ signal engages _gram_moments' explicit re-centering
    cond; σ must stay at working precision through the gram recovery."""
    x = _data(offset=1000.0)
    s_dir = np.asarray(
        RandomizedPca.with_seed(8, RNG_SEED).fit(x).singular_values_
    )
    m = RandomizedPca(
        8, seed=RNG_SEED, range_finder="gram", gram_projection="gram",
        gram_precision="default",
    ).fit(x)
    s = np.asarray(m.singular_values_)
    assert np.max(np.abs(s - s_dir) / s_dir) < 1e-4


def test_gram_projection_no_centering():
    x = _data()
    a = (
        RandomizedPcaBuilder(6).seed(RNG_SEED).centering(False)
        .range_finder("gram").gram_projection("data").build().fit(x)
    )
    b = (
        RandomizedPcaBuilder(6).seed(RNG_SEED).centering(False)
        .range_finder("gram").gram_projection("gram").build().fit(x)
    )
    sa = np.asarray(a.singular_values_)
    sb = np.asarray(b.singular_values_)
    assert np.max(np.abs(sa - sb) / sa) < 5e-5


def test_gram_projection_sharded_matches_unsharded():
    mesh = make_mesh(8)
    x = _data(n=2003)  # uneven rows exercise pad+mask
    m1 = RandomizedPca(
        8, seed=RNG_SEED, range_finder="gram", gram_projection="gram"
    ).fit(x)
    m2 = (
        RandomizedPcaBuilder(8).seed(RNG_SEED).range_finder("gram")
        .gram_projection("gram").mesh(mesh).build().fit(x)
    )
    s1 = np.asarray(m1.singular_values_)
    s2 = np.asarray(m2.singular_values_)
    assert np.max(np.abs(s1 - s2) / s1) < 1e-5
    c1, c2 = np.asarray(m1.components_), np.asarray(m2.components_)
    assert np.max(np.abs(c1 - c2)) < 1e-4


def test_gram_projection_rank_deficient():
    """Collinear data: the σ-cutoff zeroes the dead direction's U
    column (transforms to exact zeros), and nothing NaNs."""
    x = np.array([[0.0, 0.0], [3.0, 4.0], [6.0, 8.0]], np.float64)
    m = RandomizedPca(
        2, seed=RNG_SEED, range_finder="gram", gram_projection="gram",
        n_power_iters=2,
    )
    y = np.asarray(m.fit_transform(x))
    assert np.all(np.isfinite(y))
    s = np.asarray(m.singular_values_)
    assert abs(s[0] - np.sqrt(50.0)) < 1e-8  # rank-1: σ₁ = √50
    assert abs(s[1]) < 1e-6
    assert np.max(np.abs(np.abs(y[:, 0]) - [5.0, 0.0, 5.0])) < 1e-8
    assert np.max(np.abs(y[:, 1])) < 1e-6  # dead direction → zeros


def test_gram_projection_forces_gram_finder():
    """Explicit projection='gram' with finder='auto' implies the Gram
    finder even where auto would pick direct (CPU)."""
    x = _data(n=400, d=32)
    m = RandomizedPca(
        4, seed=RNG_SEED, gram_projection="gram"
    ).fit(x)  # range_finder defaults to "auto"
    s_dir = np.asarray(
        RandomizedPca.with_seed(4, RNG_SEED).fit(x).singular_values_
    )
    s = np.asarray(m.singular_values_)
    assert np.max(np.abs(s - s_dir) / s_dir) < 5e-5


def test_gram_projection_invalid_combos():
    x = _data(n=200, d=16)
    with pytest.raises(ValueError, match="unknown gram projection"):
        RandomizedPca(4, gram_projection="bogus")
    with pytest.raises(ValueError, match="requires range_finder"):
        randomized_pca_fit(
            jnp.asarray(x), key_from_seed(RNG_SEED), n_components=4,
            range_finder="direct", gram_projection="gram",
            cfg=("t-invalid", 1),
        )
    # The mixed f64 finder's 1e-10 σ contract cannot ride an f32 Gram.
    with pytest.raises(ValueError, match="mixed"):
        randomized_pca_fit(
            jnp.asarray(x.astype(np.float64)), key_from_seed(RNG_SEED),
            n_components=4, range_finder="gram", finder_precision="f32",
            gram_projection="gram", cfg=("t-invalid", 2),
        )
    # Pinned gram projection forces the gram finder, whose complex
    # rejection still applies.
    with pytest.raises(ValueError, match="real dtypes"):
        randomized_pca_fit(
            jnp.asarray(x.astype(np.complex64)), key_from_seed(RNG_SEED),
            n_components=4, range_finder="auto", gram_projection="gram",
            cfg=("t-invalid", 3),
        )


def test_gram_projection_auto_resolution():
    from petal_decomposition_tpu.ops.linalg import effective_platform

    # Explicit settings are honored everywhere.
    assert _resolve_gram_projection("data", "gram", False) == "data"
    assert _resolve_gram_projection("gram", "gram", False) == "gram"
    # Auto never picks the gram recovery off the gram finder.
    assert _resolve_gram_projection("auto", "direct", False) == "data"
    # Auto on CPU keeps the data-side recovery (reference-parity grade
    # at zero extra cost); accelerators take the zero-pass recovery.
    expected = "data" if effective_platform() == "cpu" else "gram"
    assert _resolve_gram_projection("auto", "gram", False) == expected
    # The mixed finder never auto-picks it (f64 σ contract).
    assert _resolve_gram_projection("auto", "gram", True) == "data"
