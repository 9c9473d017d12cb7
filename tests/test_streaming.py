"""Out-of-core (streamed) fit tests.

The reference has no streaming analogue (every fit takes the whole
matrix, pca.rs:195-231); the contract tested here is the one stated in
``models/streaming.py``: streamed == in-core Gram-path results up to
the documented sign convention and Gram-grade accuracy, single-pass
shifted accumulation survives mean-dominated data, and the stream API
rejects malformed input with the reference's ``InvalidInput`` taxonomy.
"""

import numpy as np
import pytest

import jax
import petal_decomposition_tpu as pdt
from petal_decomposition_tpu.errors import InvalidInput, LinalgError
from petal_decomposition_tpu.models import streaming


def _data(n=5000, d=64, offset=3.0, dtype=np.float64, seed=0):
    rng = np.random.default_rng(seed)
    # A decaying spectrum so top components are well separated.
    scales = np.linspace(3.0, 1.0, d)
    return (rng.normal(size=(n, d)) * scales + offset).astype(dtype)


def _align_signs(ref, other):
    s = np.sign(np.sum(ref * other, axis=1))[:, None]
    return other * s


def test_exact_stream_matches_in_core_gram():
    x = _data()
    m_ic = pdt.Pca(5, solver="gram").fit(x)
    m_st = pdt.Pca(5).fit_batched(
        [x[:1700], x[1700:4100], x[4100:]], block_rows=1024
    )
    s_ic = np.asarray(m_ic.singular_values_)
    s_st = np.asarray(m_st.singular_values_)
    np.testing.assert_allclose(s_st, s_ic, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(m_st.mean_), np.asarray(m_ic.mean_), atol=1e-12
    )
    np.testing.assert_allclose(
        float(m_st._total_variance), float(m_ic._total_variance),
        rtol=1e-10,
    )
    c_ic = np.asarray(m_ic.components_)
    c_st = _align_signs(c_ic, np.asarray(m_st.components_))
    np.testing.assert_allclose(c_st, c_ic, atol=1e-8)
    # explained_variance_ratio flows from sigma + total_variance.
    np.testing.assert_allclose(
        np.asarray(m_st.explained_variance_ratio()),
        np.asarray(m_ic.explained_variance_ratio()),
        rtol=1e-8,
    )


def test_stream_block_size_invariance():
    x = _data(n=3000)
    a = pdt.Pca(4).fit_batched(x, block_rows=256)
    b = pdt.Pca(4).fit_batched(
        (x[i : i + 999] for i in range(0, 3000, 999)), block_rows=1024
    )
    np.testing.assert_allclose(
        np.asarray(a.singular_values_),
        np.asarray(b.singular_values_),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(a.mean_), np.asarray(b.mean_), atol=1e-10
    )


def test_stream_survives_mean_domination():
    """The shifted accumulation is the whole point: a naive uncentered
    Gram at offset 1000 would lose ~6 digits to cancellation."""
    x = _data(n=4000, d=32, offset=1000.0)
    m = pdt.Pca(4).fit_batched(x, block_rows=512)
    # Oracle: explicit centering + SVD in numpy float64.
    xc = x - x.mean(axis=0)
    s_ref = np.linalg.svd(xc, compute_uv=False)[:4]
    np.testing.assert_allclose(
        np.asarray(m.singular_values_), s_ref, rtol=1e-9
    )
    assert m.last_fit_stats_.extra["mean_shift_ratio"] < 1e-2


def test_stream_no_centering():
    x = _data(n=2000, d=24, offset=2.0)
    m_ic = pdt.Pca(3, centering=False, solver="gram").fit(x)
    m_st = pdt.Pca(3, centering=False).fit_batched(x, block_rows=512)
    np.testing.assert_allclose(
        np.asarray(m_st.singular_values_),
        np.asarray(m_ic.singular_values_),
        rtol=1e-10,
    )
    assert np.all(np.asarray(m_st.mean_) == 0)


def test_stream_f32_grade():
    x64 = _data(n=4000, d=48)
    s_ref = np.asarray(pdt.Pca(4).fit(x64).singular_values_)
    m32 = pdt.Pca(4).fit_batched(x64.astype(np.float32), block_rows=512)
    s32 = np.asarray(m32.singular_values_)
    assert s32.dtype == np.float32
    np.testing.assert_allclose(s32, s_ref, rtol=1e-4)


def test_randomized_stream_matches_in_core_gram_finder():
    x = _data()
    ic = pdt.RandomizedPca(5, seed=42, range_finder="gram").fit(x)
    st = pdt.RandomizedPca(5, seed=42).fit_batched(x, block_rows=1024)
    s_ic = np.asarray(ic.singular_values_)
    s_st = np.asarray(st.singular_values_)
    # Same seed → same sketch → same subspace, and the streamed solve
    # reconstructs the in-core exact recovery from G's l×l algebra
    # (streaming._randomized_solve), so σ agree to roundoff.
    np.testing.assert_allclose(s_st, s_ic, rtol=1e-12)
    c_ic = np.asarray(ic.components_)
    c_st = _align_signs(c_ic, np.asarray(st.components_))
    np.testing.assert_allclose(c_st, c_ic, atol=1e-10)
    # And the 5%-band randomized-vs-exact contract (pca.rs:989-1027
    # pattern) holds for the streamed path too.
    s_ex = np.asarray(pdt.Pca(5).fit(x).singular_values_)
    np.testing.assert_allclose(s_st, s_ex, rtol=0.05)
    np.testing.assert_allclose(
        np.asarray(st.explained_variance_ratio()),
        np.asarray(ic.explained_variance_ratio()),
        rtol=0.05,
    )


def test_randomized_stream_advances_key():
    x = _data(n=1000, d=16)
    m = pdt.RandomizedPca(3, seed=7)
    k0 = np.asarray(jax.random.key_data(m._key))
    m.fit_batched(x, block_rows=256)
    k1 = np.asarray(jax.random.key_data(m._key))
    assert not np.array_equal(k0, k1)
    # Refit continues the stream (stateful-RNG contract, like fit()).
    m.fit_batched(x, block_rows=256)
    assert not np.array_equal(k1, np.asarray(jax.random.key_data(m._key)))


def test_stream_on_mesh_matches_single_device():
    from petal_decomposition_tpu.parallel.mesh import make_mesh

    x = _data(n=2048, d=32)
    mesh = make_mesh(8)
    single = pdt.Pca(4).fit_batched(x, block_rows=512)
    meshed = pdt.PcaBuilder(4).mesh(mesh).build().fit_batched(
        x, block_rows=512
    )
    np.testing.assert_allclose(
        np.asarray(meshed.singular_values_),
        np.asarray(single.singular_values_),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(meshed.mean_), np.asarray(single.mean_), atol=1e-12
    )
    r = pdt.RandomizedPcaBuilder(4).seed(3).mesh(mesh).build()
    r.fit_batched(x, block_rows=512)
    r1 = pdt.RandomizedPca(4, seed=3).fit_batched(x, block_rows=512)
    np.testing.assert_allclose(
        np.asarray(r.singular_values_),
        np.asarray(r1.singular_values_),
        rtol=1e-12,
    )


def test_transform_batched_matches_transform():
    x = _data(n=3000, d=40)
    m = pdt.Pca(6).fit_batched(x, block_rows=512)
    y_ref = np.asarray(m.transform(x))
    y_st = m.transform_batched(
        [x[:1234], x[1234:1234], x[1234:]], block_rows=700
    )
    np.testing.assert_allclose(y_st, y_ref, atol=1e-10)
    r = pdt.RandomizedPca(6, seed=1).fit_batched(x)
    np.testing.assert_allclose(
        r.transform_batched(x, block_rows=999),
        np.asarray(r.transform(x)),
        atol=1e-10,
    )


def test_streamed_model_serializes():
    x = _data(n=1500, d=24)
    m = pdt.Pca(3).fit_batched(x, block_rows=512)
    from petal_decomposition_tpu.utils.serialize import from_bytes, to_bytes
    m2 = from_bytes(to_bytes(m))
    np.testing.assert_allclose(
        np.asarray(m2.transform(x[:7])), np.asarray(m.transform(x[:7]))
    )


def test_stream_int_input_promotes():
    x = np.arange(600, dtype=np.int64).reshape(100, 6) % 17
    m = pdt.Pca(2).fit_batched([x[:60], x[60:]], block_rows=64)
    assert np.asarray(m.singular_values_).dtype == np.float64


def test_stream_errors():
    x = _data(n=100, d=8)
    with pytest.raises(InvalidInput):
        pdt.Pca(2).fit_batched([])
    with pytest.raises(InvalidInput):
        pdt.Pca(2).fit_batched([x[:0]])  # rows exist but all empty
    with pytest.raises(InvalidInput):
        pdt.Pca(2).fit_batched([x[:10, :5], x[:10, :6]])
    with pytest.raises(InvalidInput):
        pdt.Pca(5).fit_batched([x[:3]])  # n < k
    with pytest.raises(InvalidInput):
        pdt.Pca(2).fit_batched([x.astype(np.complex128)])
    with pytest.raises(InvalidInput):
        pdt.Pca(2).fit_batched(x, block_rows=0)
    with pytest.raises(InvalidInput):
        pdt.Pca(2).fit_batched([x[None]])  # 3-d block
    with pytest.raises(InvalidInput):
        pdt.Pca(2).transform_batched(x[:5])  # not fitted
    with pytest.raises(InvalidInput):
        pdt.RandomizedPca(2).fit_batched(iter([]))


def test_stream_block_rows_validation_everywhere():
    from petal_decomposition_tpu.parallel.mesh import make_mesh

    x = _data(n=64, d=8)
    fitted = pdt.Pca(2).fit_batched(x, block_rows=32)
    with pytest.raises(InvalidInput):
        fitted.transform_batched(x, block_rows=0)
    with pytest.raises(InvalidInput):
        fitted.transform_batched(x, block_rows=-3)
    mesh = make_mesh(8)
    with pytest.raises(InvalidInput):
        pdt.PcaBuilder(2).mesh(mesh).build().fit_batched(x, block_rows=0)
    with pytest.raises(InvalidInput):
        pdt.PcaBuilder(2).mesh(mesh).build().fit_batched(x, block_rows=-7)


def test_stream_mixed_dtype_contract():
    x64 = _data(n=200, d=8)
    x32 = x64.astype(np.float32)
    # Lossy downcast into the stream dtype is rejected...
    with pytest.raises(InvalidInput):
        pdt.Pca(2).fit_batched([x32[:100], x64[100:]], block_rows=64)
    # ...safe upcasts are accepted (f32 and int blocks into an f64
    # stream).
    m = pdt.Pca(2).fit_batched(
        [x64[:80], x32[80:160], (x64[160:] * 0 + 3).astype(np.int64)],
        block_rows=64,
    )
    assert np.asarray(m.singular_values_).dtype == np.float64


def test_transform_batched_tail_not_padded():
    """The transform path has no one-program constraint; a small input
    must not be padded to a full default block (65536 rows)."""
    from petal_decomposition_tpu.models import streaming

    x = _data(n=100, d=8)
    m = pdt.Pca(2).fit_batched(x, block_rows=64)
    shapes = []
    orig = streaming._uniform_chunks

    def spy(blocks, block_rows, **kw):
        for chunk, n_valid in orig(blocks, block_rows, **kw):
            shapes.append(chunk.shape)
            yield chunk, n_valid

    try:
        streaming._uniform_chunks = spy
        y = m.transform_batched(x)  # default block_rows = 65536
    finally:
        streaming._uniform_chunks = orig
    assert shapes == [(100, 8)]
    np.testing.assert_allclose(y, np.asarray(m.transform(x)), atol=1e-10)


def test_stream_failed_refit_preserves_state(monkeypatch):
    x = _data(n=400, d=16)
    m = pdt.Pca(3).fit_batched(x, block_rows=128)
    sig = np.asarray(m.singular_values_).copy()

    def boom(off, dtype, dim, what):
        raise LinalgError(f"{what} did not converge")

    monkeypatch.setattr(
        "petal_decomposition_tpu.models.streaming._linalg"
        ".check_certificate",
        boom,
    )
    with pytest.raises(LinalgError):
        m.fit_batched(x, block_rows=128)
    np.testing.assert_array_equal(np.asarray(m.singular_values_), sig)


def test_stream_stats_recorded():
    x = _data(n=1000, d=16)
    m = pdt.Pca(2).fit_batched(x, block_rows=256)
    st = m.last_fit_stats_
    assert st.n_samples == 1000 and st.n_features == 16
    assert st.extra["streamed_blocks"] == 4
    assert st.extra["mean_shift_ratio"] >= 0
    assert st.wall_time_s > 0


def test_stream_sign_convention_deterministic():
    x = _data(n=800, d=12)
    vt = np.asarray(pdt.Pca(3).fit_batched(x).components_)
    # Each component's largest-|entry| is positive.
    piv = vt[np.arange(3), np.argmax(np.abs(vt), axis=1)]
    assert np.all(piv > 0)


def test_uniform_chunks_padding():
    blocks = [np.ones((3, 2)), np.ones((4, 2)), np.ones((2, 2))]
    chunks = list(streaming._uniform_chunks(iter(blocks), 4))
    assert [c[1] for c in chunks] == [4, 4, 1]
    assert all(c[0].shape == (4, 2) for c in chunks)
    # Padded tail rows are zero.
    assert np.all(chunks[-1][0][1:] == 0)


def test_stream_empty_first_block_does_not_pin_dtype():
    """A zero-row block at the head of a stream (common with filtered
    readers) must neither reject nor downgrade the stream dtype."""
    x64 = _data(n=200, d=8)
    m = pdt.Pca(2).fit_batched(
        [x64[:0].astype(np.float32), x64], block_rows=64
    )
    assert np.asarray(m.singular_values_).dtype == np.float64
    m2 = pdt.Pca(2).fit_batched(
        [x64[:0].astype(np.int64), x64.astype(np.float32)], block_rows=64
    )
    assert np.asarray(m2.singular_values_).dtype == np.float32


def test_partial_fit_matches_fit_batched():
    x = _data(n=6000, d=32)
    m = pdt.Pca(4)
    for i in range(0, 6000, 2000):
        m.partial_fit(x[i : i + 2000], block_rows=512)
    ref = pdt.Pca(4).fit_batched(x, block_rows=512)
    np.testing.assert_allclose(
        np.asarray(m.singular_values_),
        np.asarray(ref.singular_values_),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(m.mean_), np.asarray(ref.mean_), atol=1e-12
    )
    assert m._n_samples == 6000
    assert m.last_fit_stats_.extra["partial_fit_calls"] == 3
    assert m.last_fit_stats_.extra["streamed_blocks"] == 12


def test_partial_fit_usable_after_every_call():
    x = _data(n=2000, d=16)
    m = pdt.Pca(3).partial_fit(x[:1000], block_rows=256)
    y1 = np.asarray(m.transform(x[:5]))
    assert y1.shape == (5, 3)
    m.partial_fit(x[1000:])
    assert m._n_samples == 2000
    assert np.asarray(m.transform(x[:5])).shape == (5, 3)


def test_partial_fit_randomized_consumes_subkeys():
    x = _data(n=2000, d=16)
    r = pdt.RandomizedPca(3, seed=9)
    k0 = np.asarray(jax.random.key_data(r._key))
    r.partial_fit(x[:1000], block_rows=256)
    k1 = np.asarray(jax.random.key_data(r._key))
    r.partial_fit(x[1000:])
    k2 = np.asarray(jax.random.key_data(r._key))
    assert not np.array_equal(k0, k1) and not np.array_equal(k1, k2)
    # Statistically consistent with the one-shot streamed fit.
    ref = pdt.RandomizedPca(3, seed=9).fit_batched(x, block_rows=256)
    np.testing.assert_allclose(
        np.asarray(r.singular_values_),
        np.asarray(ref.singular_values_),
        rtol=0.05,
    )


def test_partial_fit_full_fit_restarts_stream():
    x = _data(n=1500, d=16)
    m = pdt.Pca(3).partial_fit(x[:1000], block_rows=256)
    m.fit(x[:500])
    m.partial_fit(x[:700], block_rows=256)
    assert m._n_samples == 700
    m.fit_batched(x, block_rows=256)
    m.partial_fit(x[:300], block_rows=256)
    assert m._n_samples == 300


def test_partial_fit_pins_block_rows_and_dtype():
    x = _data(n=400, d=8)
    m = pdt.Pca(2).partial_fit(x[:200], block_rows=128)
    with pytest.raises(InvalidInput):
        m.partial_fit(x[200:], block_rows=64)
    m2 = pdt.Pca(2).partial_fit(x[:200].astype(np.float32))
    with pytest.raises(InvalidInput):
        m2.partial_fit(x[200:])  # f64 into an f32 stream


def test_partial_fit_serialization_drops_stream_state():
    from petal_decomposition_tpu.utils.serialize import from_bytes, to_bytes

    x = _data(n=600, d=8)
    m = pdt.Pca(2).partial_fit(x, block_rows=256)
    m2 = from_bytes(to_bytes(m))
    assert getattr(m2, "_stream", None) is None
    np.testing.assert_allclose(
        np.asarray(m2.transform(x[:4])), np.asarray(m.transform(x[:4]))
    )


def test_partial_fit_on_mesh():
    from petal_decomposition_tpu.parallel.mesh import make_mesh

    x = _data(n=2048, d=16)
    mesh = make_mesh(8)
    m = pdt.PcaBuilder(3).mesh(mesh).build()
    m.partial_fit(x[:1024], block_rows=256).partial_fit(x[1024:])
    ref = pdt.Pca(3).fit_batched(x, block_rows=256)
    np.testing.assert_allclose(
        np.asarray(m.singular_values_),
        np.asarray(ref.singular_values_),
        rtol=1e-11,
    )


def test_partial_fit_uncentered_survives_donation():
    """Review regression: with centering=False, installed state
    (total_variance/gram-derived values) must not alias the donated
    carry — the next partial_fit call would delete it."""
    x = _data(n=600, d=8)
    m = pdt.Pca(2, centering=False)
    m.partial_fit(x[:300], block_rows=128)
    tv1 = float(m._total_variance)
    ratio1 = np.asarray(m.explained_variance_ratio()).copy()
    m.partial_fit(x[300:], block_rows=128)
    # The PREVIOUS call's values must still be materializable had we
    # kept references (simulate by checking the new fit is consistent
    # and no deleted-array error was raised above).
    assert float(m._total_variance) > tv1
    assert np.all(np.isfinite(ratio1))


def test_partial_fit_bad_block_is_retry_safe():
    """Review regression: a malformed block later in a call must not
    leave earlier blocks of that call in the stream."""
    x = _data(n=800, d=8)
    m = pdt.Pca(2).partial_fit(x[:400], block_rows=128)
    with pytest.raises(InvalidInput):
        m.partial_fit([x[400:600], x[:10, :5]])  # wrong width later
    assert m._n_samples == 400  # nothing from the failed call
    m.partial_fit([x[400:600], x[600:]])
    assert m._n_samples == 800
    ref = pdt.Pca(2).fit_batched(x, block_rows=128)
    np.testing.assert_allclose(
        np.asarray(m.singular_values_),
        np.asarray(ref.singular_values_),
        rtol=1e-12,
    )


def test_partial_fit_zero_rows_is_noop():
    x = _data(n=400, d=8)
    r = pdt.RandomizedPca(2, seed=3).partial_fit(x, block_rows=128)
    k1 = np.asarray(jax.random.key_data(r._key))
    sig = np.asarray(r.singular_values_).copy()
    r.partial_fit(np.zeros((0, 8)))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(r._key)), k1
    )
    np.testing.assert_array_equal(np.asarray(r.singular_values_), sig)
    assert r._n_samples == 400


def test_partial_fit_mesh_block_rows_consistent():
    """Review regression: the same user block_rows must be accepted on
    every call even when the mesh rounds it up internally."""
    from petal_decomposition_tpu.parallel.mesh import make_mesh

    x = _data(n=416, d=8)
    mesh = make_mesh(8)
    m = pdt.PcaBuilder(2).mesh(mesh).build()
    m.partial_fit(x[:200], block_rows=100)  # rounds to 104
    m.partial_fit(x[200:], block_rows=100)  # same value: must pass
    assert m._n_samples == 416


def test_partial_fit_dtype_upcast_matches_fit_batched_rule():
    """Review regression: partial_fit across calls follows the same
    safe-cast dtype rule as fit_batched within one stream."""
    x64 = _data(n=400, d=8)
    m = pdt.Pca(2).partial_fit(x64[:200], block_rows=128)
    m.partial_fit(x64[200:].astype(np.float32))  # safe upcast into f64
    assert np.asarray(m.singular_values_).dtype == np.float64
    assert m._n_samples == 400


def test_randomized_stream_components_orthonormal_when_deficient():
    """Dead sketch directions yield an orthonormal completion (like the
    in-core eigh behavior), not zero rows."""
    rng = np.random.default_rng(0)
    x = np.outer(rng.normal(size=400), rng.normal(size=12))
    x = x + 1e-9 * rng.normal(size=(400, 12))
    r = pdt.RandomizedPca(3, seed=1).fit_batched(x, block_rows=128)
    vt = np.asarray(r.components_)
    np.testing.assert_allclose(vt @ vt.T, np.eye(3), atol=1e-5)


def test_mixing_cache_invalidated_by_refit():
    x = _data(n=300, d=4)
    ica = pdt.FastIca.with_seed(7).fit(x)
    m1 = np.asarray(ica.mixing_)
    assert ica.mixing_ is ica.mixing_  # cached
    ica.fit(x[:200])
    m2 = np.asarray(ica.mixing_)
    assert m1.shape == m2.shape and not np.array_equal(m1, m2)


def test_stream_rejects_solver_full():
    """An explicit solver="full" pins the thin-SVD accuracy contract;
    a single-pass stream is Gram-grade and must refuse rather than
    silently downgrade (fit_batched AND partial_fit)."""
    import pytest

    x = np.random.default_rng(0).standard_normal((64, 6))
    m = pdt.Pca(2, solver="full")
    with pytest.raises(pdt.InvalidInput, match="Gram-grade"):
        m.fit_batched([x])
    with pytest.raises(pdt.InvalidInput, match="Gram-grade"):
        m.partial_fit(x)
    # solver="gram" and the default "auto" both stream fine.
    pdt.Pca(2, solver="gram").fit_batched([x])
    pdt.Pca(2).fit_batched([x])


# -- streamed FastICA ---------------------------------------------------


def _ica_data(n=4000, k=3, seed=5, dtype=np.float64):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 50, n)
    s = np.c_[np.sin(2 * t), np.sign(np.sin(3 * t)), rng.laplace(size=n)]
    a = rng.standard_normal((k, k)) + np.eye(k) * 2
    return (s @ a.T + 1.5).astype(dtype)


def test_stream_fast_ica_matches_in_core_eigh():
    """fit_batched == the in-core whiten_solver="eigh" fit at the same
    key: identical key-split order, pass-1 Gram == in-core whitening
    Gram up to f64 accumulation roundoff, same ica_par on the same X1."""
    x = _ica_data()
    seed = 1_234_567_891_011_121_314
    ic = pdt.FastIca.with_seed(seed)
    ic._whiten_solver = "eigh"
    ic.fit(x)
    st = pdt.FastIca.with_seed(seed).fit_batched(
        [x[:1500], x[1500:3100], x[3100:]], block_rows=1024
    )
    assert st.n_iter_ == ic.n_iter_
    np.testing.assert_allclose(
        np.asarray(st.components()), np.asarray(ic.components()),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(st.mean()), np.asarray(ic.mean()), rtol=1e-12
    )
    assert st.last_fit_stats_.extra["streamed_blocks"] >= 3
    assert st.last_fit_stats_.n_iter == st.n_iter_


def test_stream_fast_ica_mixed_precision_matches_full():
    """fit_batched with iteration_precision="f32" (the three-stage
    f32 → ds64 → f64 escalation) lands on the same fixed point as the
    full-precision streamed fit, up to per-row sign (odd contrasts
    admit −W as the same fixed point; which sign a run lands on
    depends on the precision path's trajectory)."""
    x = _ica_data(seed=13)
    seed = 1_234_567_891_011_121_314
    full = pdt.FastIca(seed=seed, tol=1e-9,
                       iteration_precision="full").fit_batched(
        x, block_rows=1024
    )
    mixed = pdt.FastIca(seed=seed, tol=1e-9,
                        iteration_precision="f32").fit_batched(
        x, block_rows=1024
    )
    cf = np.asarray(full.components())
    cm = np.asarray(mixed.components())
    signs = np.sign(np.sum(cm * cf, axis=1, keepdims=True))
    np.testing.assert_allclose(signs * cm, cf, atol=1e-6)


def test_stream_fast_ica_unmixes_from_memmap_like_array():
    """A single 2-D array-like streams host-side (memmap path) and the
    recovered sources match the in-core unmixing."""
    x = _ica_data(seed=7)
    st = pdt.FastIca.with_seed(99).fit_batched(x, block_rows=700)
    s_st = np.asarray(st.transform(x))
    # Each recovered source should correlate ~1 with an in-core one.
    ic = pdt.FastIca.with_seed(99)
    ic._whiten_solver = "eigh"
    s_ic = np.asarray(ic.fit(x).transform(x))
    c = np.corrcoef(s_st.T, s_ic.T)[:3, 3:]
    assert (np.abs(c).max(axis=1) > 0.999).all()
    # transform_batched stacks the same projection.
    tb = st.transform_batched([x[:1000], x[1000:]], block_rows=512)
    np.testing.assert_allclose(tb, s_st, atol=1e-10)


def test_stream_fast_ica_n_components_subset():
    x = _ica_data(seed=11)
    st = pdt.FastIca(seed=3, n_components=2).fit_batched(x)
    assert st.components().shape == (2, 3)


def test_stream_fast_ica_rejects_one_shot_iterator():
    x = _ica_data()
    gen = (b for b in [x[:2000], x[2000:]])
    with pytest.raises(InvalidInput, match="one-shot"):
        pdt.FastIca(seed=1).fit_batched(gen)
    # A zero-arg callable replays fine.
    m = pdt.FastIca(seed=1).fit_batched(
        lambda: iter([x[:2000], x[2000:]])
    )
    assert m.components().shape == (3, 3)


def test_stream_fast_ica_buffer_budget(monkeypatch):
    x = _ica_data()
    monkeypatch.setenv("PETAL_STREAM_ICA_HBM_BYTES", "1024")
    with pytest.raises(InvalidInput, match="GiB"):
        pdt.FastIca(seed=1).fit_batched(x)


def test_stream_fast_ica_budget_scales_with_mesh(monkeypatch):
    """The k x n buffer budget divides by the mesh size (column
    sharding), and the error message names the per-device footprint."""
    from petal_decomposition_tpu.models.streaming import (
        _check_ica_buffer_budget,
    )

    monkeypatch.setenv("PETAL_STREAM_ICA_HBM_BYTES", str(64 * 2**30))
    # 64 x 100M f64 = 4 GiB x 8 (temporaries+buffer) = 204 GiB: over a
    # single device's 64 GiB, under it on an 8-device mesh.
    with pytest.raises(InvalidInput, match="per device"):
        _check_ica_buffer_budget(64, 100_000_000, np.float64, 2)
    _check_ica_buffer_budget(64, 100_000_000, np.float64, 8)


def test_stream_fast_ica_detects_stream_change():
    x = _ica_data()
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return iter([x[:2000]] if calls["n"] > 1 else [x])

    with pytest.raises(InvalidInput, match="changed between passes"):
        pdt.FastIca(seed=1).fit_batched(factory)


def test_stream_fast_ica_whiten_false_matches_in_core():
    x = _ica_data(seed=13)
    xc = x - x.mean(0)
    u, s, _ = np.linalg.svd(xc, full_matrices=False)
    xw = u * np.sqrt(x.shape[0])
    ic = pdt.FastIca(whiten=False, seed=21).fit(xw)
    st = pdt.FastIca(whiten=False, seed=21).fit_batched(
        [xw[:1000], xw[1000:]], block_rows=512
    )
    assert st.n_iter_ == ic.n_iter_
    np.testing.assert_allclose(
        np.asarray(st.components()), np.asarray(ic.components()),
        rtol=1e-8, atol=1e-10,
    )
    assert np.all(np.asarray(st.mean()) == 0)


def test_stream_gram_precision_resolution():
    """Streamed "auto" resolves per dtype/platform at the first chunk:
    "high" for f32 on accelerators (measured 2.7e-6 rel sigma on the
    adversarial spectrum, GRAM_GRADE.json), "highest" for f64 and on
    CPU; explicit settings pass through untouched."""
    from petal_decomposition_tpu.models import streaming as sm

    orig = sm._resolve_stream_precision
    assert orig("default", np.float32) == "default"
    assert orig("high", np.float64) == "high"
    # platform-dependent branch, pinned both ways via monkeypatching
    # the platform probe the resolver uses
    from petal_decomposition_tpu.ops import linalg as lin

    real = lin.effective_platform
    try:
        lin.effective_platform = lambda: "tpu"
        assert orig("auto", np.float32) == "high"
        assert orig("auto", np.float64) == "highest"
        lin.effective_platform = lambda: "cpu"
        assert orig("auto", np.float32) == "highest"
    finally:
        lin.effective_platform = real
    # The resolved grade is recorded on the stream state (and is what
    # the nonstationarity guard rates against).
    x = _data(n=256, d=8)
    m = pdt.RandomizedPca(2, seed=3)
    m.partial_fit(x, block_rows=128)
    assert m._stream.precision in ("high", "highest")
    assert m.last_fit_stats_ is not None


def test_stream_gram_precision_plumbed():
    """RandomizedPca(gram_precision=...) reaches the streamed Gram
    pass: an explicit setting is honored, and the fit still lands
    within the documented accuracy envelope on CPU (where every
    precision level executes as f32/f64 ops — this pins the plumbing,
    the bf16 accuracy numbers themselves are measured on hardware in
    benchmarks/north_star.py and benchmarks/gram_grade_study.py)."""
    x = _data(n=3000, d=32)
    m_hi = pdt.RandomizedPca(4, seed=9).fit_batched(x, block_rows=1024)
    m_def = pdt.RandomizedPca(4, seed=9, gram_precision="default")
    m_def.fit_batched(x, block_rows=1024)
    np.testing.assert_allclose(
        np.asarray(m_def.singular_values_),
        np.asarray(m_hi.singular_values_),
        rtol=1e-3,
    )
    m_pf = pdt.RandomizedPca(4, seed=9, gram_precision="default")
    m_pf.partial_fit(x, block_rows=1024)
    np.testing.assert_allclose(
        np.asarray(m_pf.singular_values_),
        np.asarray(m_def.singular_values_),
        rtol=1e-12,
    )


def test_stream_fast_ica_on_mesh_matches_single_device():
    """Single-process mesh streamed ICA (column-sharded whitened
    buffer, n_valid-masked padded tail) == the single-device streamed
    fit at the same key."""
    from petal_decomposition_tpu.parallel import make_mesh

    mesh = make_mesh(min(8, len(jax.devices())))
    x = _ica_data(n=4100, seed=17)  # not a block multiple: tail pads
    st1 = pdt.FastIca.with_seed(31).fit_batched(x, block_rows=1024)
    stm = pdt.FastIca(seed=31, mesh=mesh).fit_batched(x, block_rows=1024)
    assert stm.n_iter_ == st1.n_iter_
    np.testing.assert_allclose(
        np.asarray(stm.components()), np.asarray(st1.components()),
        rtol=1e-6, atol=1e-9,
    )
    # whiten=False keeps its single-device contract.
    with pytest.raises(InvalidInput, match="single-device"):
        pdt.FastIca(seed=1, whiten=False, mesh=mesh).fit_batched(x)


def test_stream_fast_ica_rejects_pinned_svd_whitening():
    """An explicit whiten_solver='svd' pins kappa-sensitivity thin-SVD
    whitening; the stream only has the Gram (kappa^2) — reject instead
    of silently downgrading, like solver='full' on the PCA models."""
    x = _ica_data()
    m = pdt.FastIca(seed=1)
    m._whiten_solver = "svd"
    with pytest.raises(InvalidInput, match="whiten_solver='svd'"):
        m.fit_batched(x)
    # 'eigh' and the default 'auto' both stream fine.
    pdt.FastIca(seed=1).fit_batched(x)


# -- H2D prefetch pipeline ---------------------------------------------


def test_prefetch_on_off_identical(monkeypatch):
    """The worker-thread prefetch is a pure pipelining change: results
    must be bit-identical to the synchronous fallback."""
    x = _data(4000, 32, dtype=np.float32)

    def fit(depth):
        monkeypatch.setenv("PETAL_STREAM_PREFETCH", depth)
        m = pdt.RandomizedPca(4, seed=11)
        m.fit_batched(x, block_rows=700)
        return m

    m0, m3 = fit("0"), fit("3")
    np.testing.assert_array_equal(
        np.asarray(m0.singular_values_), np.asarray(m3.singular_values_)
    )
    np.testing.assert_array_equal(
        np.asarray(m0.components()), np.asarray(m3.components())
    )


def test_prefetch_propagates_generator_error():
    """An exception inside the user's block generator surfaces from
    fit_batched (in stream order), not on a leaked worker thread."""
    import threading

    def bad_blocks():
        yield _data(500, 16, dtype=np.float32)
        raise RuntimeError("source failed mid-stream")

    before = threading.active_count()
    with pytest.raises(RuntimeError, match="source failed mid-stream"):
        pdt.Pca(2).fit_batched(bad_blocks(), block_rows=200)
    # The prefetch worker exits with the stream (joined in the
    # generator's finally); give a grace period for the join.
    for _ in range(50):
        if threading.active_count() <= before:
            break
        import time

        time.sleep(0.02)
    assert threading.active_count() <= before


def test_prefetch_width_mismatch_mid_stream():
    """A consumer-side validation error (cross-call width check) stops
    the stream cleanly through the prefetcher."""
    m = pdt.Pca(2)
    m.partial_fit(_data(300, 16, dtype=np.float32), block_rows=100)
    with pytest.raises(InvalidInput, match="inconsistent block widths"):
        m.partial_fit(_data(300, 8, dtype=np.float32))


def test_prefetch_keeps_fill_pass_contract():
    """Streamed FastICA's two passes still detect a stream that shrinks
    between passes, with the prefetcher in the loop."""
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        n = 600 if calls["n"] == 1 else 400
        return iter([_ica_data()[:n]])

    with pytest.raises(InvalidInput, match="stream changed"):
        pdt.FastIca(seed=1).fit_batched(flaky, block_rows=256)


def test_stream_mesh_ica_tail_pads_to_mesh_multiple():
    """The whitened buffer pads its tail to the next mesh.size
    multiple, not a whole block: n one row past a block boundary must
    cost at most mesh.size-1 dead columns (was: block_rows-1)."""
    from petal_decomposition_tpu.parallel import make_mesh

    mesh = make_mesh(min(8, len(jax.devices())))
    n = 2048 + 1  # one row past a block boundary
    x = _ica_data(n=n, seed=23)
    st1 = pdt.FastIca.with_seed(29).fit_batched(x, block_rows=1024)
    stm = pdt.FastIca(seed=29, mesh=mesh).fit_batched(x, block_rows=1024)
    cols = stm.last_fit_stats_.extra["whitened_buffer_cols"]
    assert n <= cols < n + mesh.size
    assert st1.last_fit_stats_.extra["whitened_buffer_cols"] == n
    assert stm.n_iter_ == st1.n_iter_
    np.testing.assert_allclose(
        np.asarray(stm.components()), np.asarray(st1.components()),
        rtol=1e-6, atol=1e-9,
    )


def test_stream_mean_nonstationarity_guard():
    """A stream whose mean drifts past the grade's rating fails loudly
    (LinalgError) before any state mutates, instead of silently
    delivering below-grade sigma; a higher grade absorbs the same
    drift.  (r = n·|mu − mu_hat|²/tr(Gc) is bounded by n/n_block1, so
    only a many-block monotone drift can trip even the default rating
    of 2 — exactly the sorted-stream failure mode.)"""
    rng = np.random.default_rng(0)
    d = 16
    # 8 blocks whose means sweep +a → −a: the first block's mean is a
    # maximally bad shift for the whole stream.  (r ≈ a²/(a²/3 + 1) ≈ 3
    # for any a ≫ 1; a stays moderate so κ(X)² remains inside the f32
    # Gram grade and the σ parity check below is meaningful.)
    a = 40.0
    drift = [
        (rng.normal(size=(500, d)) + mu).astype(np.float32)
        for mu in np.linspace(a, -a, 8)
    ]
    m = pdt.RandomizedPcaBuilder(3).seed(1).gram_precision(
        "default").build()
    with pytest.raises(LinalgError, match="mean-nonstationary"):
        m.fit_batched(drift, block_rows=500)
    # failed fit left the model unfitted
    with pytest.raises(Exception):
        m.transform(drift[0])
    # The same data fits at a higher grade (rmax 1e5)...
    hi = pdt.RandomizedPcaBuilder(3).seed(1).gram_precision(
        "highest").build()
    hi.fit_batched(drift, block_rows=500)
    # ...and matches the in-core fit at that seed.
    ic = pdt.RandomizedPcaBuilder(3).seed(1).range_finder(
        "gram").build().fit(np.concatenate(drift))
    np.testing.assert_allclose(
        np.asarray(hi.singular_values_),
        np.asarray(ic.singular_values_), rtol=1e-3,
    )
