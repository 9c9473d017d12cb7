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


@pytest.mark.parametrize("seed", range(2))
@pytest.mark.parametrize("offset", [0.0, 30.0, 3000.0])
def test_randomized_fused_centering_offset_fuzz(seed, offset):
    """Fused-centering pipeline across mean offsets spanning the
    analytic→guarded regimes (r grows with offset²): σ and total
    variance must track host-f64 truth everywhere."""
    import jax.numpy as jnp

    from petal_decomposition_tpu.parallel.distributed import (
        randomized_pca_fit,
    )
    from petal_decomposition_tpu.utils.rng import key_from_seed

    rng = np.random.default_rng(300 + seed)
    x = (rng.standard_normal((800, 96)).astype(np.float32)
         * np.linspace(1, 5, 96, dtype=np.float32) + offset)
    st = randomized_pca_fit(
        jnp.asarray(x), key_from_seed(7 + seed), n_components=6,
        normalizer="cholqr2", fuse_centering=True,
        cfg=("offset-fuzz", seed, offset),
    )
    x64 = x.astype(np.float64)
    xc = x64 - x64.mean(0)
    s_ref = np.linalg.svd(xc, compute_uv=False)
    s = np.asarray(st["sigma"])[:6]
    assert np.max(np.abs(s - s_ref[:6]) / s_ref[:6]) < 2e-2  # sketch band
    tv = float(st["total_variance"])
    tv_ref = (xc ** 2).sum()
    assert abs(tv - tv_ref) / tv_ref < 1e-5


@pytest.mark.parametrize("seed", range(3))
def test_streamed_fit_fuzz(seed):
    """Random shapes, offsets, and block partitions: streamed ==
    in-core gram fit; arbitrary re-partitions of the same data agree."""
    rng = np.random.default_rng(300 + seed)
    for n, d in ((37, 5), (129, 12), (500, 31), (64, 64)):
        offset = float(rng.uniform(-50, 50))
        x = rng.standard_normal((n, d)) * rng.uniform(0.5, 4, d) + offset
        k = int(rng.integers(1, min(n, d) + 1))
        ref = Pca(k, solver="gram").fit(x)

        # Random partition into blocks, random block_rows.
        cuts = np.sort(rng.integers(0, n + 1, size=rng.integers(0, 4)))
        blocks = np.split(x, cuts)
        br = int(rng.integers(1, n + 2))
        st = Pca(k).fit_batched(blocks, block_rows=br)
        s_ref = np.asarray(ref.singular_values_)
        np.testing.assert_allclose(
            np.asarray(st.singular_values_), s_ref,
            rtol=1e-9, atol=1e-9 * max(s_ref[0], 1),
        )
        np.testing.assert_allclose(
            np.asarray(st.mean_), np.asarray(ref.mean_),
            atol=1e-10 * max(abs(offset), 1),
        )

        # partial_fit over a second random partition agrees.  Early
        # calls may reject the solve while cumulative n < k — the
        # accumulated rows stay in the stream (documented), so the
        # final state still covers everything.
        from petal_decomposition_tpu.errors import InvalidInput

        cuts2 = np.sort(rng.integers(0, n + 1, size=rng.integers(1, 4)))
        m = Pca(k)
        fed = 0
        for b in np.split(x, cuts2):
            fed += b.shape[0]
            try:
                m.partial_fit(b, block_rows=br)
            except InvalidInput:
                assert fed < k or b.shape[0] == 0
        np.testing.assert_allclose(
            np.asarray(m.singular_values_), s_ref,
            rtol=1e-9, atol=1e-9 * max(s_ref[0], 1),
        )
