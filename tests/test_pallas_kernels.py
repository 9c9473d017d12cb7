"""Pallas kernel tests (interpret mode on CPU; compiled path exercised
on TPU via the runtime probe + TPU drives)."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

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
