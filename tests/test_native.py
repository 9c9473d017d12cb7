"""Native C++ backend tests — the L1 mirror (SURVEY C8 analogue).

The native library is the cross-validation oracle for the JAX Jacobi
kernels and an alternate ``linalg_backend``.  Built on demand via make;
tests skip if the toolchain is unavailable.
"""

import numpy as np
import pytest

from petal_decomposition_tpu import Pca, config
from petal_decomposition_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.mark.parametrize("shape", [(40, 8), (8, 40), (20, 20)])
def test_native_svd(shape):
    rng = np.random.default_rng(0)
    a = rng.standard_normal(shape)
    u, s, vt = native.jacobi_svd(a)
    k = min(shape)
    assert np.abs((u * s) @ vt - a).max() < 1e-12
    assert np.abs(u.T @ u - np.eye(k)).max() < 1e-12
    sn = np.linalg.svd(a, compute_uv=False)
    assert np.abs(s - sn).max() < 1e-12


def test_native_eigh():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((15, 15))
    a = a + a.T
    w, v = native.jacobi_eigh(a)
    assert np.abs(w - np.linalg.eigvalsh(a)).max() < 1e-12
    assert np.abs(v @ np.diag(w) @ v.T - a).max() < 1e-12
    assert np.all(np.diff(w) >= -1e-12)


def test_native_qr():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((30, 7))
    q = native.qr(a)
    assert np.abs(q.T @ q - np.eye(7)).max() < 1e-13
    assert np.abs(q @ (q.T @ a) - a).max() < 1e-12


def test_native_lu_pl():
    import scipy.linalg as sla

    rng = np.random.default_rng(3)
    a = rng.standard_normal((12, 5))
    pl = native.lu_pl(a)
    p, l, _ = sla.lu(a)
    assert np.abs(pl - p @ l).max() < 1e-13


def test_native_matches_jax_jacobi():
    """Oracle check: native and JAX Jacobi agree on singular values."""
    from petal_decomposition_tpu.ops.jacobi import jacobi_svd

    rng = np.random.default_rng(4)
    a = rng.standard_normal((60, 12))
    _, s_native, _ = native.jacobi_svd(a)
    _, s_jax, _, _, _ = jacobi_svd(a)
    assert np.abs(s_native - np.asarray(s_jax)).max() < 1e-11


def test_native_backend_pca():
    """Full model fit through linalg_backend='native'."""
    old = config.linalg_backend
    config.linalg_backend = "native"
    try:
        rng = np.random.default_rng(5)
        x = rng.standard_normal((80, 10))
        y = np.asarray(Pca(3).fit_transform(x))
    finally:
        config.linalg_backend = old
    y_ref = np.asarray(Pca(3).fit_transform(x))
    assert np.abs(y - y_ref).max() < 1e-10


def test_native_sweep_budget_and_error_taxonomy():
    """The C++ core honors an explicit sweep budget (rc=1 surfaces as
    NativeError) and ops.linalg.native_call maps it into the reference
    error taxonomy (LinalgError) under config.jacobi_max_sweeps."""
    import pytest

    from petal_decomposition_tpu.config import config
    from petal_decomposition_tpu.errors import LinalgError
    from petal_decomposition_tpu.ops.linalg import native_call
    from petal_decomposition_tpu.utils import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    a = rng.standard_normal((60, 24)) * (1.5 ** -np.arange(24))[None, :]

    with pytest.raises(native.NativeError):
        native.jacobi_svd(a, max_sweeps=1)
    u, s, vt = native.jacobi_svd(a)  # default budget converges
    assert s.shape == (24,)

    old = config.jacobi_max_sweeps
    try:
        config.jacobi_max_sweeps = 1
        with pytest.raises(LinalgError):
            native_call(native.jacobi_svd, a)
    finally:
        config.jacobi_max_sweeps = old
    native_call(native.jacobi_svd, a)  # restored budget converges
