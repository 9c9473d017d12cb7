"""Model persistence tests — the reference's serde round-trip contract
(pca.rs:936-947, 1029-1041; ica.rs:422-432): a deserialized model
transforms identically, and the RNG state survives so the next fit draws
the same stream."""

import numpy as np

from petal_decomposition_tpu import (
    FastIca,
    Pca,
    RandomizedPca,
    load,
    save,
)
from petal_decomposition_tpu.utils.serialize import from_bytes, to_bytes

RNG_SEED = 1_234_567_891_011_121_314


def test_pca_roundtrip(tmp_path):
    """ref: pca.rs:936-947."""
    x = np.array([[1.0, 1.0]], dtype=np.float32)
    pca = Pca(1)
    pca.fit(x)
    path = tmp_path / "pca.npz"
    save(pca, path)
    loaded = load(path)
    np.testing.assert_array_equal(
        np.asarray(loaded.components()), np.asarray(pca.components())
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.mean()), np.asarray(pca.mean())
    )


def test_pca_roundtrip_transforms_identically(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 8))
    pca = Pca(3)
    pca.fit(x)
    loaded = from_bytes(to_bytes(pca))
    np.testing.assert_array_equal(
        np.asarray(loaded.transform(x)), np.asarray(pca.transform(x))
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.explained_variance_ratio()),
        np.asarray(pca.explained_variance_ratio()),
    )


def test_randomized_pca_roundtrip_rng_state(tmp_path):
    """ref: pca.rs:309-315 — the RNG state serializes, so a restored
    model's next fit continues the same stream."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((40, 10))

    pca = RandomizedPca.with_seed(2, RNG_SEED)
    pca.fit(x)
    blob = to_bytes(pca)

    pca.fit(x)  # advances the original's stream
    restored = from_bytes(blob)
    restored.fit(x)  # must draw the same subkey as the line above
    np.testing.assert_array_equal(
        np.asarray(restored.components()), np.asarray(pca.components())
    )


def test_fast_ica_roundtrip(tmp_path):
    """ref: ica.rs:422-432."""
    x = np.array([[0.0, 0.0], [1.0, 1.0], [1.0, -1.0]])
    ica = FastIca.with_seed(RNG_SEED)
    ica.fit(x)
    path = tmp_path / "ica.npz"
    save(ica, path)
    loaded = load(path)
    np.testing.assert_array_equal(
        np.asarray(loaded.components()), np.asarray(ica.components())
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.transform(x)), np.asarray(ica.transform(x))
    )
    assert loaded.n_iter_ == ica.n_iter_


def test_unfitted_model_roundtrip():
    pca = Pca(4, centering=False)
    loaded = from_bytes(to_bytes(pca))
    assert loaded.n_components() == 4
    assert loaded._centering is False
    assert loaded.components() is None


def test_mesh_not_serialized():
    import jax

    from petal_decomposition_tpu import PcaBuilder
    from petal_decomposition_tpu.parallel import make_mesh

    mesh = make_mesh(min(8, len(jax.devices())))
    x = np.random.default_rng(2).standard_normal((64, 6))
    pca = PcaBuilder(2).mesh(mesh).build().fit(x)
    loaded = from_bytes(to_bytes(pca))
    assert loaded._mesh is None  # re-attach explicitly after load
    np.testing.assert_allclose(
        np.asarray(loaded.transform(x)),
        np.asarray(pca.transform(x)),
        atol=1e-12,
    )


def test_future_format_version_rejected():
    """A model written by a NEWER library version must load with a clear
    error, not a silently-wrong model."""
    import io
    import json

    import numpy as np
    import pytest

    from petal_decomposition_tpu import Pca
    from petal_decomposition_tpu.utils import serialize

    m = Pca(2).fit(np.random.default_rng(0).standard_normal((20, 4)))
    data = serialize.to_bytes(m)
    with np.load(io.BytesIO(data)) as npz:
        meta = json.loads(bytes(npz["__meta__"].tobytes()).decode())
        arrays = {k: npz[k] for k in npz.files if k != "__meta__"}
    meta["__format__"] = serialize._FORMAT_VERSION + 1
    buf = io.BytesIO()
    np.savez(buf, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    with pytest.raises(ValueError, match="format v"):
        serialize.from_bytes(buf.getvalue())


def _strip_meta_fields(data: bytes, fields: tuple[str, ...]) -> bytes:
    """Rewrite an archive as an older library version would have written
    it: the given meta fields absent entirely."""
    import io
    import json

    with np.load(io.BytesIO(data)) as npz:
        meta = json.loads(bytes(npz["__meta__"].tobytes()).decode())
        arrays = {k: npz[k] for k in npz.files if k != "__meta__"}
    for f in fields:
        meta.pop(f, None)
    buf = io.BytesIO()
    np.savez(
        buf,
        __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **arrays,
    )
    return buf.getvalue()


def test_old_format_missing_fields_backfilled():
    """Archives written before a field existed (e.g. v0.2.0 lacks
    RandomizedPca._range_finder and FastIca._whiten) must load with
    current constructor defaults — transform AND refit both work."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((40, 10))

    pca = RandomizedPca.with_seed(2, RNG_SEED).fit(x)
    old = _strip_meta_fields(
        to_bytes(pca), ("_range_finder", "_gram_precision")
    )
    loaded = from_bytes(old)
    assert loaded._range_finder == "auto"
    assert loaded._gram_precision == "auto"
    np.testing.assert_array_equal(
        np.asarray(loaded.transform(x)), np.asarray(pca.transform(x))
    )
    loaded.fit(x)  # refit must not raise AttributeError

    ica = FastIca.with_seed(RNG_SEED)
    ica.fit(rng.standard_normal((200, 4)))
    old = _strip_meta_fields(to_bytes(ica), ("_whiten",))
    loaded = from_bytes(old)
    assert loaded._whiten is True
    loaded.fit(rng.standard_normal((200, 4)))
