"""Pallas kernel tests (interpret mode on CPU; compiled path exercised
on TPU via the runtime probe + TPU drives)."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from petal_decomposition_tpu.ops.pallas.ica_kernels import (
    _pick_tile,
    ica_contrast_update,
    supports,
)


def _reference(fun, w, x1):
    wx = w @ x1
    if fun == "logcosh":
        g = np.tanh(wx)
        gp = 1 - g * g
    elif fun == "exp":
        e = np.exp(-(wx**2) / 2)
        g = wx * e
        gp = (1 - wx**2) * e
    else:
        g = wx**3
        gp = 3 * wx**2
    return g @ x1.T, gp.sum(axis=1)


@pytest.mark.parametrize("fun", ["logcosh", "exp", "cube"])
def test_ica_contrast_update_interpret(fun):
    rng = np.random.default_rng(0)
    k, n = 16, 1000  # n not a tile multiple: exercises pad correction
    w = rng.standard_normal((k, k)).astype(np.float32)
    x1 = rng.standard_normal((k, n)).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        gx, gsum = ica_contrast_update(w, x1, fun=fun, tile=256)

    gx_ref, gsum_ref = _reference(fun, w, x1)
    scale = np.abs(gx_ref).max()
    assert np.abs(np.asarray(gx) - gx_ref).max() / scale < 1e-4
    assert (
        np.abs(np.asarray(gsum) - gsum_ref).max()
        / max(np.abs(gsum_ref).max(), 1)
        < 1e-4
    )


def test_supports_bounds():
    assert supports(64, np.float32)
    assert not supports(64, np.float64)
    assert not supports(63, np.float32)  # not sublane-aligned
    assert not supports(1024, np.float32)  # VMEM-bounded


def test_pick_tile_respects_vmem():
    bn = _pick_tile(512, 8192, 10**6)
    assert bn % 128 == 0
    # x/wx/g tiles + two W-sized buffers stay within the 8 MB budget
    assert 3 * 512 * bn * 4 + 2 * 512 * 512 * 4 <= 8 * 1024 * 1024
