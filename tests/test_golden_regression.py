"""Self-regression golden values.

The reference pins randomized-path outputs under a fixed seed
(pca.rs:949-970); bit-exact cross-implementation parity is impossible
(different PRNG), so these pin THIS library's outputs under its own
fixed keys — refactors that unintentionally change numerics (kernel
dispatch, fusion, RNG plumbing) fail here.  Values generated on the CPU
backend at f64; regenerate deliberately (scripts in the test docstring)
when an intentional numeric change lands.
"""

import numpy as np

from petal_decomposition_tpu import FastIca, RandomizedPca

SEED = 1_234_567_891_011_121_314

RPCA_Y0 = [-0.23324515503941554, 0.5670276661464103, -0.0839822802060243]
RPCA_SV = [6.190955395808471, 4.790701494161056, 4.026808295593152]
ICA_COMP = [
    [0.017895895859993023, -0.04841797410217456],
    [0.08630477727889607, -0.01628774590697353],
]
ICA_NITER = 2


def test_randomized_pca_golden_regression():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((20, 6))
    pca = RandomizedPca.with_seed(3, SEED)
    y = np.asarray(pca.fit_transform(x))
    np.testing.assert_allclose(y[0], RPCA_Y0, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(pca.singular_values()), RPCA_SV, atol=1e-10
    )


def test_fast_ica_golden_regression():
    from petal_decomposition_tpu import config

    if config.linalg_backend not in ("auto", "jacobi"):
        import pytest

        pytest.skip("golden values pinned for the default jacobi eigh")
    rng = np.random.default_rng(0)
    rng.standard_normal((20, 6))  # keep the stream aligned with the gen script
    s = np.stack(
        [rng.uniform(-1, 1, 500), np.sign(rng.standard_normal(500))], axis=1
    )
    xm = s @ np.array([[1.0, 0.4], [0.2, 1.0]])
    ica = FastIca.with_seed(SEED)
    ica.fit(xm)
    np.testing.assert_allclose(
        np.asarray(ica.components()), ICA_COMP, atol=1e-10
    )
    assert ica.n_iter_ == ICA_NITER
