"""Unit tests for the centering-fused contractions (ops/centered.py)."""

import numpy as np
import jax.numpy as jnp

from petal_decomposition_tpu.ops.centered import (
    centered_gram,
    centered_matmul,
    centered_rmatmul,
    centered_sqnorm,
)


def _setup(seed=0, n=50, d=8, l=3):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)) + 5.0  # offset makes centering matter
    m = rng.standard_normal((d, l))
    q = rng.standard_normal((n, l))
    mu = x.mean(axis=0)
    xc = x - mu
    return x, m, q, mu, xc


def test_centered_matmul():
    x, m, _, mu, xc = _setup()
    got = np.asarray(centered_matmul(jnp.asarray(x), jnp.asarray(m),
                                     jnp.asarray(mu)))
    np.testing.assert_allclose(got, xc @ m, atol=1e-10)


def test_centered_matmul_masks_padded_rows():
    x, m, _, mu, xc = _setup()
    xp = np.vstack([x, np.zeros((3, x.shape[1]))])
    got = np.asarray(
        centered_matmul(jnp.asarray(xp), jnp.asarray(m), jnp.asarray(mu),
                        n_valid=x.shape[0])
    )
    np.testing.assert_allclose(got[: x.shape[0]], xc @ m, atol=1e-10)
    assert np.all(got[x.shape[0]:] == 0)


def test_centered_rmatmul():
    x, _, q, mu, xc = _setup()
    got = np.asarray(centered_rmatmul(jnp.asarray(x), jnp.asarray(q),
                                      jnp.asarray(mu)))
    np.testing.assert_allclose(got, xc.T @ q, atol=1e-9)


def test_centered_gram_and_sqnorm():
    x, _, _, mu, xc = _setup()
    n = x.shape[0]
    got = np.asarray(centered_gram(jnp.asarray(x), jnp.asarray(mu), n))
    np.testing.assert_allclose(got, xc.T @ xc, atol=1e-8)
    got_n = float(centered_sqnorm(jnp.asarray(x), jnp.asarray(mu), n))
    np.testing.assert_allclose(got_n, (xc**2).sum(), atol=1e-8)


def test_debugging_helpers():
    import pytest

    from petal_decomposition_tpu.errors import InvalidInput
    from petal_decomposition_tpu.utils.debugging import (
        check_finite,
        nan_debugging,
    )

    check_finite(jnp.ones((2, 2)))
    with pytest.raises(InvalidInput):
        check_finite(jnp.asarray([np.nan, 1.0]))
    with nan_debugging():
        _ = jnp.ones(3) + 1  # clean computation passes
