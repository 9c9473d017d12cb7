"""Model persistence.

The reference serializes full model state — including the RNG state, so
a deserialized model continues the same stream — behind an optional serde
feature (ref: pca.rs:36-40, 309-315; ica.rs:33-39; Cargo.toml:41-47).

Here every model serializes to a single ``.npz`` archive: arrays (incl.
the PRNG key data) as npz entries, scalar/config fields in an embedded
JSON header.  The contract matches the reference's round-trip tests
(pca.rs:936-947, ica.rs:423-432): a loaded model transforms identically
and its next fit draws the same random stream.
"""

from __future__ import annotations

import io
import json

import jax
import numpy as np

__all__ = ["save", "load", "to_bytes", "from_bytes"]

_ARRAY_PREFIX = "arr_"

# Bump on any incompatible layout change; readers reject newer formats
# with a clear error instead of constructing a silently-wrong model.
_FORMAT_VERSION = 1


def _model_state(model) -> tuple[dict, dict]:
    """Split a model's ``__dict__`` into (json-able scalars, arrays)."""
    meta = {
        "__class__": type(model).__name__,
        "__format__": _FORMAT_VERSION,
    }
    arrays = {}
    for name, value in vars(model).items():
        if name == "_mesh":
            # Device meshes are process-local hardware handles; a loaded
            # model re-attaches via the builder's .mesh(...) if desired.
            meta[name] = None
        elif name == "last_fit_stats_":
            continue  # transient observability data, not model state
        elif name == "_mixing_cache":
            continue  # identity-keyed derived cache; recomputed on use
        elif name == "_stream":
            # partial_fit accumulator: process-local device buffers.  A
            # restored model transforms identically and can start a NEW
            # stream; continuing a half-accumulated one across processes
            # is not supported (documented in models/streaming.py).
            continue
        elif value is None:
            meta[name] = None
        elif isinstance(value, (bool, int, float, str)):
            meta[name] = value
        elif isinstance(value, jax.Array) and jax.dtypes.issubdtype(
            value.dtype, jax.dtypes.prng_key
        ):
            arrays[name + "__keydata"] = np.asarray(
                jax.random.key_data(value)
            )
        else:
            arrays[name] = np.asarray(value)
    return meta, arrays


def to_bytes(model) -> bytes:
    """In-memory form of :func:`save`.

    >>> from petal_decomposition_tpu import RandomizedPca
    >>> from petal_decomposition_tpu.utils.serialize import (
    ...     to_bytes, from_bytes)
    >>> m = from_bytes(to_bytes(RandomizedPca(3, seed=7)))
    >>> type(m).__name__, m.n_components()
    ('RandomizedPca', 3)
    """
    meta, arrays = _model_state(model)
    buf = io.BytesIO()
    np.savez(
        buf,
        __meta__=np.frombuffer(
            json.dumps(meta).encode("utf-8"), dtype=np.uint8
        ),
        **arrays,
    )
    return buf.getvalue()


def _default_instance(cls):
    """A default-constructed model used as the attribute baseline.

    ``seed=0`` keeps construction deterministic and host-side (threefry
    key derivation only — no device work); the file's own key data
    overwrites it for models that carry one.
    """
    if cls.__name__ == "FastIca":
        return cls(seed=0)
    if cls.__name__ == "RandomizedPca":
        return cls(0, seed=0)
    return cls(0)


def from_bytes(data: bytes):
    from ..models.fast_ica import FastIca
    from ..models.pca import Pca
    from ..models.randomized_pca import RandomizedPca

    classes = {c.__name__: c for c in (Pca, RandomizedPca, FastIca)}
    with np.load(io.BytesIO(data)) as npz:
        meta = json.loads(bytes(npz["__meta__"].tobytes()).decode("utf-8"))
        fmt = meta.pop("__format__", 1)
        if fmt > _FORMAT_VERSION:
            raise ValueError(
                f"serialized model uses format v{fmt}; this version of "
                f"petal_decomposition_tpu reads up to v{_FORMAT_VERSION} "
                "— upgrade the library to load it"
            )
        cls = classes[meta.pop("__class__")]
        model = cls.__new__(cls)
        # Backfill first: files written by older library versions lack
        # fields added since (e.g. v0.2.0 archives have no _range_finder /
        # _whiten).  Seed every attribute from a default-constructed
        # instance, then let the file's values overwrite — a loaded old
        # model refits with current defaults instead of AttributeError.
        for name, value in vars(_default_instance(cls)).items():
            setattr(model, name, value)
        for name, value in meta.items():
            setattr(model, name, value)
        for name in npz.files:
            if name == "__meta__":
                continue
            if name.endswith("__keydata"):
                setattr(
                    model,
                    name[: -len("__keydata")],
                    jax.random.wrap_key_data(jax.numpy.asarray(npz[name])),
                )
            else:
                setattr(model, name, jax.numpy.asarray(npz[name]))
    return model


def save(model, path) -> None:
    """Serialize a fitted (or unfitted) model to ``path`` (.npz).

    A loaded model transforms identically and continues the same PRNG
    stream (the reference's serde contract, pca.rs:309-315: RNG state
    rides along).

    >>> import numpy as np, tempfile, os
    >>> from petal_decomposition_tpu import Pca, save, load
    >>> x = np.random.default_rng(0).standard_normal((50, 4))
    >>> m = Pca(2).fit(x)
    >>> with tempfile.TemporaryDirectory() as d:
    ...     p = os.path.join(d, "model.npz")
    ...     save(m, p)
    ...     m2 = load(p)
    >>> bool(np.allclose(np.asarray(m2.transform(x)),
    ...                  np.asarray(m.transform(x))))
    True
    """
    with open(path, "wb") as f:
        f.write(to_bytes(model))


def load(path):
    """Load a model written by :func:`save` (see there for the
    round-trip contract and an example)."""
    with open(path, "rb") as f:
        return from_bytes(f.read())
