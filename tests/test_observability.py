"""Observability tests (SURVEY §5: metrics/logging rows)."""

import numpy as np

from petal_decomposition_tpu import FastIca, Pca, RandomizedPca


def test_pca_fit_stats():
    x = np.random.default_rng(0).standard_normal((64, 8))
    pca = Pca(2)
    pca.fit(x)
    stats = pca.last_fit_stats_
    assert stats.wall_time_s > 0
    assert stats.n_samples == 64
    assert stats.n_features == 8


def test_ica_fit_stats_n_iter():
    rng = np.random.default_rng(1)
    n = 2000
    s = np.stack(
        [rng.uniform(-1, 1, n), np.sign(rng.standard_normal(n))], axis=1
    )
    x = s @ np.array([[1.0, 0.4], [0.2, 1.0]])
    ica = FastIca.with_seed(7)
    ica.fit(x)
    assert ica.last_fit_stats_.n_iter == ica.n_iter_ >= 1


def test_randomized_pca_fit_stats():
    x = np.random.default_rng(2).standard_normal((128, 16))
    pca = RandomizedPca.with_seed(3, 99)
    pca.fit_transform(x)
    assert pca.last_fit_stats_.n_samples == 128


def test_stats_not_serialized():
    from petal_decomposition_tpu.utils.serialize import from_bytes, to_bytes

    x = np.random.default_rng(3).standard_normal((32, 4))
    pca = Pca(2)
    pca.fit(x)
    loaded = from_bytes(to_bytes(pca))
    assert not hasattr(loaded, "last_fit_stats_")


def test_multihost_helpers_single_process():
    from petal_decomposition_tpu.parallel import multihost

    multihost.initialize()  # no-op on single process
    assert multihost.is_multihost() is False
    assert multihost.process_index() == 0


def test_config_change_retraces_jitted_fit():
    """Jitted fits key their cache on config.cache_key(): switching the
    linalg backend after a fit must not silently reuse stale dispatch."""
    from petal_decomposition_tpu import config

    x = np.random.default_rng(5).standard_normal((40, 6))
    y1 = np.asarray(Pca(2).fit_transform(x))
    old = config.linalg_backend
    config.linalg_backend = "xla"
    try:
        y2 = np.asarray(Pca(2).fit_transform(x))
    finally:
        config.linalg_backend = old
    np.testing.assert_allclose(y1, y2, atol=1e-9)


def test_cache_key_covers_trace_affecting_fields():
    """jacobi_max_sweeps is baked into traced while_loop bounds; changing
    it must change the jit cache key (round-1 advisor finding)."""
    from petal_decomposition_tpu.config import config

    before = config.cache_key()
    old = config.jacobi_max_sweeps
    try:
        config.jacobi_max_sweeps = old + 7
        assert config.cache_key() != before
    finally:
        config.jacobi_max_sweeps = old


def test_trace_produces_artifact(tmp_path):
    """utils.profiling.trace must actually write a profiler trace
    (SURVEY §5 tracing row): a plugins/profile/<ts>/ dir with a
    .trace.json.gz (Perfetto) or .xplane.pb artifact inside."""
    import pathlib

    from petal_decomposition_tpu.utils.profiling import trace

    x = np.random.default_rng(0).standard_normal((256, 16))
    with trace(str(tmp_path)):
        Pca(4).fit(x)
    produced = [
        p for p in pathlib.Path(tmp_path).rglob("*")
        if p.is_file() and (
            p.name.endswith(".trace.json.gz")
            or p.name.endswith(".xplane.pb")
        )
    ]
    assert produced, (
        f"no trace artifact under {tmp_path}: "
        f"{[str(p) for p in pathlib.Path(tmp_path).rglob('*')]}"
    )
