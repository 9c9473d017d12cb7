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


class TestDf64:
    """df64 (double-single) primitives and the f64 VMEM Jacobi kernel."""

    def test_primitives_accuracy(self):
        import jax.numpy as jnp

        from petal_decomposition_tpu.ops.pallas import df64

        rng = np.random.default_rng(0)
        x = rng.standard_normal((64, 4)) * np.exp(
            rng.uniform(-10, 10, (64, 4))
        )
        y = rng.standard_normal((64, 4)) * np.exp(
            rng.uniform(-10, 10, (64, 4))
        )
        xh, xl = df64.split_f64(jnp.asarray(x))
        yh, yl = df64.split_f64(jnp.asarray(y))

        def relerr(pair, want):
            got = np.asarray(df64.join_f64(*pair))
            denom = np.where(want == 0, 1, np.abs(want))
            return (np.abs(got - want) / denom).max()

        assert relerr((xh, xl), x) < 1e-14
        assert relerr(df64.add(xh, xl, yh, yl), x + y) < 1e-13
        assert relerr(df64.mul(xh, xl, yh, yl), x * y) < 1e-13
        assert relerr(df64.div(xh, xl, yh, yl), x / y) < 1e-13
        assert relerr(df64.dot0(xh, xl, yh, yl), (x * y).sum(0)) < 1e-12

    @pytest.mark.parametrize("shape", [(50, 8), (33, 7), (64, 64)])
    def test_f64_kernel_interpret(self, shape):
        import jax.numpy as jnp

        from petal_decomposition_tpu.ops.pallas.jacobi_f64_kernel import (
            jacobi_svd_vmem_f64,
        )

        rng = np.random.default_rng(1)
        m, n = shape
        x = rng.standard_normal(shape)
        with pltpu.force_tpu_interpret_mode():
            arot, v, off = jacobi_svd_vmem_f64(jnp.asarray(x))
        arot, v = np.asarray(arot), np.asarray(v)
        s = np.linalg.norm(arot, axis=0)
        order = np.argsort(-s)
        ss = s[order]
        u = arot[:, order] / np.where(ss > 0, ss, 1)
        vt = v[:, order].T
        k = min(m, n)
        assert np.abs((u * ss) @ vt - x).max() < 1e-11
        sn = np.linalg.svd(x, compute_uv=False)
        assert np.abs(ss[:k] - sn).max() / sn[0] < 1e-11
        assert np.abs(u[:, :k].T @ u[:, :k] - np.eye(k)).max() < 1e-12
