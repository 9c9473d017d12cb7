"""Gram-accelerated range finder + fused moments kernel.

The gram finder builds the SAME subspace — range(X(XᵀX)ᑫΩ) — as the
reference's streaming power iteration (pca.rs:689-718) from a single
Gram pass; recovery (B = QᴴX) projects against the exact data, so σ
must agree with the direct path to working precision on CPU (where
matmul-precision flags are no-ops and both paths are exact f32/f64).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from petal_decomposition_tpu import RandomizedPca, RandomizedPcaBuilder
from petal_decomposition_tpu.parallel import make_mesh
from petal_decomposition_tpu.parallel.distributed import (
    _resolve_range_finder,
)

RNG_SEED = 1_234_567_891_011_121_314  # ref: pca.rs:860


def _data(n=3000, d=256, dtype=np.float32, offset=0.0):
    rng = np.random.default_rng(42)
    x = rng.standard_normal((n, d)) @ np.diag(np.linspace(1, 30, d))
    return (x + offset).astype(dtype)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_gram_matches_direct(dtype):
    x = _data(dtype=dtype)
    s_dir = np.asarray(
        RandomizedPca.with_seed(8, RNG_SEED).fit(x).singular_values_
    )
    m = RandomizedPca(8, seed=RNG_SEED, range_finder="gram")
    s_gram = np.asarray(m.fit(x).singular_values_)
    tol = 1e-5 if dtype == np.float32 else 1e-12
    assert np.max(np.abs(s_dir - s_gram) / s_dir) < tol


def test_gram_transform_roundtrip():
    x = _data()
    m = RandomizedPca(6, seed=RNG_SEED, range_finder="gram").fit(x)
    y = np.asarray(m.transform(x))
    xr = np.asarray(m.inverse_transform(y))
    # Rank-6 reconstruction of a full-rank matrix: compare projections.
    y2 = np.asarray(m.transform(xr))
    assert np.allclose(y, y2, rtol=1e-4, atol=1e-3)


def test_gram_mean_dominated_guard():
    """r = n‖μ‖²/tr(Gc) ≫ threshold engages the explicitly-centered
    recompute; σ must stay at working precision."""
    x = _data(offset=1000.0)
    s_dir = np.asarray(
        RandomizedPca.with_seed(8, RNG_SEED).fit(x).singular_values_
    )
    m = RandomizedPca(
        8, seed=RNG_SEED, range_finder="gram", gram_precision="default"
    )
    s_gram = np.asarray(m.fit(x).singular_values_)
    assert np.max(np.abs(s_dir - s_gram) / s_dir) < 1e-4


def test_mean_dominated_total_variance():
    """total_variance is user-visible (explained-variance denominators):
    with fused centering the analytic ‖X‖² − n‖μ‖² subtraction loses
    ~(1+r) of the input grade at r = n‖μ‖²/‖Xc‖² and must be
    cancellation-guarded.  At offset=1000 (f32, r ≈ 3e3) the unguarded
    form errs at the ~0.1%+ level; the guard recomputes explicitly.
    Exercised at the pipeline level with fuse_centering=True — the
    accelerator configuration (CPU model fits keep explicit
    centering)."""
    import jax.numpy as jnp

    from petal_decomposition_tpu.parallel.distributed import (
        randomized_pca_fit,
    )
    from petal_decomposition_tpu.utils.rng import key_from_seed

    x = _data(offset=1000.0)
    tv_ref = ((x.astype(np.float64)
               - x.astype(np.float64).mean(0)) ** 2).sum()
    for rf in ("gram", "direct"):
        st = randomized_pca_fit(
            jnp.asarray(x), key_from_seed(RNG_SEED), n_components=8,
            normalizer="cholqr2", range_finder=rf,
            fuse_centering=True, cfg=("tv-guard", rf),
        )
        tv = float(st["total_variance"])
        assert abs(tv - tv_ref) / tv_ref < 1e-5, (rf, tv, tv_ref)


def test_gram_no_centering():
    x = _data()
    s_dir = np.asarray(
        RandomizedPcaBuilder(8).seed(RNG_SEED).centering(False).build()
        .fit(x).singular_values_
    )
    m = (
        RandomizedPcaBuilder(8).seed(RNG_SEED).centering(False)
        .range_finder("gram").build()
    )
    s_gram = np.asarray(m.fit(x).singular_values_)
    assert np.max(np.abs(s_dir - s_gram) / s_dir) < 1e-5


def test_gram_sharded_matches_unsharded():
    mesh = make_mesh(8)
    x = _data(n=2003)  # uneven rows exercise pad+mask
    m1 = RandomizedPca(8, seed=RNG_SEED, range_finder="gram").fit(x)
    m2 = (
        RandomizedPcaBuilder(8).seed(RNG_SEED).range_finder("gram")
        .mesh(mesh).build().fit(x)
    )
    s1 = np.asarray(m1.singular_values_)
    s2 = np.asarray(m2.singular_values_)
    assert np.max(np.abs(s1 - s2) / s1) < 1e-5
    c1, c2 = np.asarray(m1.components_), np.asarray(m2.components_)
    assert np.max(np.abs(np.abs(np.sum(c1 * c2, axis=1)) - 1)) < 1e-4


def test_gram_rejects_complex():
    x = _data().astype(np.complex64)
    m = RandomizedPca(4, seed=RNG_SEED, range_finder="gram")
    with pytest.raises(ValueError, match="real dtypes"):
        m.fit(x)


def test_auto_resolution():
    from petal_decomposition_tpu.ops.linalg import effective_platform

    if effective_platform() == "cpu":
        assert (
            _resolve_range_finder("auto", jnp.float32, 10**6, 1024, 42)
            == "direct"
        )
    # Complex never picks gram.
    assert (
        _resolve_range_finder("auto", jnp.complex64, 10**6, 1024, 42)
        == "direct"
    )
    # Forced gram on complex raises.
    with pytest.raises(ValueError):
        _resolve_range_finder("gram", jnp.complex64, 10**6, 1024, 42)
    # The emulated-f64 full-precision finder never picks gram (flop
    # ratio ~d/(3l) against it, and the f64 Gram program OOMs a v5e at
    # 100k×1024 — see _resolve_range_finder's docstring)...
    assert (
        _resolve_range_finder(
            "auto", jnp.float64, 10**6, 1024, 42, full_f64=True
        )
        == "direct"
    )
    # ...but an explicit request is honored.
    assert (
        _resolve_range_finder(
            "gram", jnp.float64, 10**6, 1024, 42, full_f64=True
        )
        == "gram"
    )
