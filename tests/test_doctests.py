"""Doctest runner — the reference uses doctests on every public item as
API-contract tests (SURVEY §4); same idea here."""

import doctest

import petal_decomposition_tpu.models.fast_ica as fast_ica_mod
import petal_decomposition_tpu.models.pca as pca_mod
import petal_decomposition_tpu.models.randomized_pca as rpca_mod
import petal_decomposition_tpu.models.streaming as streaming_mod
import petal_decomposition_tpu.ops.centered as centered_mod
import petal_decomposition_tpu.ops.gram_recovery as gram_recovery_mod
import petal_decomposition_tpu.ops.linalg as linalg_mod
import petal_decomposition_tpu.ops.refine as refine_mod
import petal_decomposition_tpu.ops.splitmm as splitmm_mod
import petal_decomposition_tpu.parallel.mesh as mesh_mod
import petal_decomposition_tpu.parallel.multihost as multihost_mod
import petal_decomposition_tpu.utils.profiling as profiling_mod
import petal_decomposition_tpu.utils.serialize as serialize_mod


def _run(module):
    result = doctest.testmod(module, verbose=False)
    assert result.failed == 0, f"{result.failed} doctest failures in {module}"
    assert result.attempted > 0


def test_pca_doctests():
    _run(pca_mod)


def test_randomized_pca_doctests():
    _run(rpca_mod)


def test_fast_ica_doctests():
    _run(fast_ica_mod)


def test_linalg_doctests():
    _run(linalg_mod)


def test_streaming_doctests():
    _run(streaming_mod)


def test_mesh_doctests():
    _run(mesh_mod)


def test_serialize_doctests():
    _run(serialize_mod)


def test_multihost_doctests():
    _run(multihost_mod)


def test_centered_doctests():
    _run(centered_mod)


def test_refine_doctests():
    _run(refine_mod)


def test_splitmm_doctests():
    _run(splitmm_mod)


def test_profiling_doctests():
    _run(profiling_mod)


def test_gram_recovery_doctests():
    _run(gram_recovery_mod)
