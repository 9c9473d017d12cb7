"""Seeded fuzz tests: dispatch-level results vs numpy across random
shapes and dtypes (the rebuild's answer to the reference's breadth of
embedded unit tests)."""

import numpy as np
import pytest

from petal_decomposition_tpu import Pca
from petal_decomposition_tpu.ops.linalg import eigh, svd

SHAPES = [(3, 2), (2, 3), (5, 5), (17, 4), (4, 17), (40, 33), (64, 64)]


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_svd_fuzz(seed, dtype):
    rng = np.random.default_rng(seed)
    for shape in SHAPES:
        x = rng.standard_normal(shape).astype(dtype)
        u, s, vt = svd(x)
        u, s, vt = np.asarray(u), np.asarray(s), np.asarray(vt)
        tol = 1e-11 if dtype == np.float64 else 1e-4
        scale = max(np.abs(x).max(), 1)
        assert np.abs((u * s) @ vt - x).max() / scale < tol, shape
        sn = np.linalg.svd(x, compute_uv=False)
        assert np.abs(s - sn).max() / max(sn[0], 1) < tol, shape


@pytest.mark.parametrize("seed", range(3))
def test_eigh_fuzz(seed):
    rng = np.random.default_rng(100 + seed)
    for n in (2, 3, 9, 16, 31):
        a = rng.standard_normal((n, n))
        a = a + a.T
        w, v = eigh(a)
        w, v = np.asarray(w), np.asarray(v)
        assert np.abs(w - np.linalg.eigvalsh(a)).max() < 1e-11, n
        assert np.abs(v @ np.diag(w) @ v.T - a).max() < 1e-10, n


@pytest.mark.parametrize("seed", range(3))
def test_pca_roundtrip_fuzz(seed):
    """Full-rank k: inverse_transform(transform(x)) ≈ x."""
    rng = np.random.default_rng(200 + seed)
    n, d = rng.integers(5, 60), rng.integers(2, 12)
    n = max(n, d)
    x = rng.standard_normal((int(n), int(d)))
    pca = Pca(int(d))
    y = pca.fit_transform(x)
    z = np.asarray(pca.inverse_transform(y))
    assert np.abs(z - x).max() < 1e-9
