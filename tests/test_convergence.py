"""Convergence-failure surfacing on every fit path.

The reference checks LAPACK ``info != 0`` on *every* factorization call
(ref: linalg.rs:84,115).  Here the Jacobi solvers' certificates are
threaded out of each jitted pipeline and checked host-side post-fit;
capping the sweep budget at 1 on a non-trivial matrix forces
non-convergence deterministically.
"""

import numpy as np
import pytest

from petal_decomposition_tpu import (
    FastIcaBuilder,
    LinalgError,
    Pca,
    PcaBuilder,
    RandomizedPcaBuilder,
)
from petal_decomposition_tpu.config import config
from petal_decomposition_tpu.parallel import make_mesh

RNG_SEED = 1_234_567_891_011_121_314

# Forcing non-convergence works by capping the in-house Jacobi sweep
# budget; the ``xla`` backend dispatches to jnp.linalg/LAPACK, which has
# no such cap and handles its own convergence internally (emitting
# certificates of exactly 0) — these tests are Jacobi-backend-specific
# by construction, like the reference's info!=0 checks are LAPACK's.
pytestmark = pytest.mark.skipif(
    config.linalg_backend == "xla",
    reason="forced non-convergence requires the Jacobi sweep cap",
)


@pytest.fixture
def one_sweep():
    old = config.jacobi_max_sweeps
    config.jacobi_max_sweeps = 1
    yield
    config.jacobi_max_sweeps = old


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _data(n=96, d=24):
    rng = np.random.default_rng(5)
    return rng.standard_normal((n, d)) * (1.5 ** -np.arange(d))[None, :]


def test_full_svd_path_raises(one_sweep):
    with pytest.raises(LinalgError):
        Pca(3).fit(_data())


def test_gram_path_raises(one_sweep):
    with pytest.raises(LinalgError):
        PcaBuilder(3).solver("gram").build().fit(_data())


def test_randomized_path_raises(one_sweep):
    with pytest.raises(LinalgError):
        RandomizedPcaBuilder(3).seed(RNG_SEED).build().fit(_data())


def test_sharded_randomized_path_raises(one_sweep, mesh):
    with pytest.raises(LinalgError):
        RandomizedPcaBuilder(3).seed(RNG_SEED).mesh(mesh).build().fit(
            _data()
        )


def test_sharded_gram_path_raises(one_sweep, mesh):
    with pytest.raises(LinalgError):
        PcaBuilder(3).mesh(mesh).build().fit(_data())


def test_ica_path_raises(one_sweep):
    with pytest.raises(LinalgError):
        FastIcaBuilder().seed(RNG_SEED).whiten_solver("eigh").build().fit(
            _data()
        )


def test_mesh_ica_path_raises(one_sweep, mesh):
    with pytest.raises(LinalgError):
        FastIcaBuilder().seed(RNG_SEED).mesh(mesh).build().fit(_data())


def test_check_convergence_off_suppresses(one_sweep):
    old = config.check_convergence
    config.check_convergence = False
    try:
        PcaBuilder(3).solver("gram").build().fit(_data())
    finally:
        config.check_convergence = old


def test_converged_fits_pass_checks(mesh):
    """Healthy fits on every checked path do not trip the certificates."""
    x = _data()
    Pca(3).fit(x)
    PcaBuilder(3).solver("gram").build().fit(x)
    RandomizedPcaBuilder(3).seed(RNG_SEED).mesh(mesh).build().fit(x)
    FastIcaBuilder().seed(RNG_SEED).mesh(mesh).build().fit(x)
