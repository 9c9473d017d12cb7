"""Fused sketch+moments kernel (interpret mode on CPU) and its
Gram-finder pipeline integration.

On hardware the kernel streams X once, fusing ``Y = X·W`` with the
column-sum and ‖X‖² reductions (pca.rs:531/533/707 in one pass); here
the same kernel body runs under the Pallas TPU interpreter so the CPU
suite exercises every code path, including the ragged last block and
the raw-Gram + ones-column pipeline restructure around it.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from petal_decomposition_tpu.ops.pallas import sketch_kernel
from petal_decomposition_tpu.parallel.distributed import randomized_pca_fit
from petal_decomposition_tpu.utils.rng import key_from_seed


@pytest.fixture
def interpret(monkeypatch):
    monkeypatch.setattr(sketch_kernel, "_INTERPRET", True)


def _data(n, d, offset=0.0, seed=42, decay=True):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d))
    if decay:
        x = x @ np.diag(np.linspace(1, 20, d))
    return (x + offset).astype(np.float32)


class TestKernel:
    @pytest.mark.parametrize(
        "n,d,l",
        [
            (4096, 96, 11),   # aligned rows
            (4500, 96, 11),   # ragged last block
            (4100, 128, 42),  # flagship-like panel width
        ],
    )
    def test_matches_xla(self, interpret, n, d, l):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((n, d)) + 0.3, jnp.float32)
        w = jnp.asarray(rng.standard_normal((d, l)), jnp.float32)
        y, cs, sq = sketch_kernel.fused_sketch_moments(x, w)
        # The interpreter executes the dot in full f32, so agreement
        # with an f32 XLA dot is reduction-order-level.
        y_ref = jnp.dot(x, w, precision="highest")
        scale = float(jnp.max(jnp.abs(y_ref)))
        assert float(jnp.max(jnp.abs(y - y_ref))) < 1e-4 * scale
        cs_ref = np.asarray(x).sum(axis=0, dtype=np.float64)
        np.testing.assert_allclose(np.asarray(cs), cs_ref, rtol=1e-4,
                                   atol=1e-3)
        sq_ref = (np.asarray(x).astype(np.float64) ** 2).sum()
        assert abs(float(sq) - sq_ref) / sq_ref < 1e-5

    def test_supports_gates(self):
        f = sketch_kernel.supports
        assert f(100_000, 1024, 42, np.float32)
        assert not f(100_000, 1024, 42, np.float64)  # f32 only
        assert not f(100_000, 1024, 600, np.float32)  # panel too wide
        assert not f(512, 1024, 42, np.float32)  # too small to pay off


class TestFusedGramFlow:
    def _fit(self, x, *, fused, cfg, range_finder="gram", n_components=6):
        return randomized_pca_fit(
            jnp.asarray(x), key_from_seed(11),
            n_components=n_components,
            normalizer="cholqr2",
            range_finder=range_finder,
            gram_precision="default",
            fused_sketch=fused,
            cfg=cfg,
        )

    @pytest.mark.parametrize("offset", [0.0, 0.5])
    def test_matches_direct_path(self, interpret, offset):
        """Raw-Gram subspace + appended ones column + fused moments
        must reproduce the direct finder's σ/V to f32 working
        precision on CPU (recovery projects against exact data)."""
        x = _data(4200, 64, offset=offset)
        st = self._fit(x, fused=True, cfg=("interp-fused", offset))
        st_dir = self._fit(x, fused=False, range_finder="direct",
                           cfg=("interp-dir", offset))
        s_f = np.asarray(st["sigma"])[:6]
        s_d = np.asarray(st_dir["sigma"])[:6]
        np.testing.assert_allclose(s_f, s_d, rtol=1e-4)
        # Principal axes agree up to sign (svd_flip fixes the sign,
        # but compare |cos| to stay robust to near-degenerate pairs).
        v_f = np.asarray(st["vt"])[:6]
        v_d = np.asarray(st_dir["vt"])[:6]
        cos = np.abs(np.sum(v_f * v_d, axis=1))
        np.testing.assert_allclose(cos, 1.0, atol=5e-4)
        # Moments are user-visible: exact-grade parity.
        mu_ref = np.asarray(x).mean(axis=0, dtype=np.float64)
        np.testing.assert_allclose(np.asarray(st["means"]), mu_ref,
                                   rtol=1e-4, atol=1e-5)
        tv_ref = ((np.asarray(x, np.float64) - mu_ref) ** 2).sum()
        assert abs(float(st["total_variance"]) - tv_ref) / tv_ref < 1e-5

    def test_mean_dominated_guard(self, interpret):
        """Past the r-threshold the in-graph cond must rebuild the
        subspace from an explicitly centered copy — σ accuracy holds
        even when n·‖μ‖² swamps the centered energy."""
        x = _data(4200, 64, offset=50.0)
        st = self._fit(x, fused=True, cfg=("interp-guard",))
        s_f = np.asarray(st["sigma"])[:6]
        s_ref = np.linalg.svd(
            np.asarray(x, np.float64) - np.asarray(x, np.float64).mean(0),
            compute_uv=False,
        )[:6]
        np.testing.assert_allclose(s_f, s_ref, rtol=1e-3)

    def test_mesh_shard_map_kernel(self, interpret):
        """Under a mesh trace the kernel runs per shard via shard_map:
        row-sharded Y, psum'd moments — must match the single-device
        call bit-for-bit in interpret mode (same f32 arithmetic, same
        block decomposition per shard)."""
        from petal_decomposition_tpu.ops.pallas.replication import (
            replicated_kernel_mesh,
        )
        from petal_decomposition_tpu.parallel import make_mesh
        from petal_decomposition_tpu.parallel.mesh import shard_rows_padded

        mesh = make_mesh(8)
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((4096, 96)) + 0.2, jnp.float32)
        w = jnp.asarray(rng.standard_normal((96, 11)), jnp.float32)
        y0, cs0, sq0 = sketch_kernel.fused_sketch_moments(x, w)
        x_sh, n_true = shard_rows_padded(x, mesh)
        assert n_true == x.shape[0] == x_sh.shape[0]
        with replicated_kernel_mesh(mesh):
            y1, cs1, sq1 = sketch_kernel.fused_sketch_moments(x_sh, w)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cs1), np.asarray(cs0),
                                   rtol=1e-5, atol=1e-4)
        assert abs(float(sq1) - float(sq0)) / float(sq0) < 1e-6

    def test_mesh_pipeline_uneven_rows(self, interpret):
        """Full Gram-finder pipeline with the per-shard fused kernel on
        an 8-device mesh, uneven rows (pad + masked ones column): σ,
        means and total variance must match the unsharded fused fit.
        Shapes chosen so the per-shard row count passes the kernel's
        supports() gate (4125 rows/shard ≥ 4·block)."""
        from petal_decomposition_tpu.ops.pallas.replication import (
            replicated_kernel_mesh,
        )
        from petal_decomposition_tpu.parallel import make_mesh
        from petal_decomposition_tpu.parallel.mesh import shard_rows_padded

        mesh = make_mesh(8)
        x = _data(32_999, 64, offset=0.4, decay=True)
        st1 = self._fit(x, fused=True, cfg=("interp-mesh-ref",))
        x_sh, n_true = shard_rows_padded(jnp.asarray(x), mesh)
        assert n_true != x_sh.shape[0]  # padding engaged
        with replicated_kernel_mesh(mesh):
            st2 = randomized_pca_fit(
                x_sh, key_from_seed(11), n_components=6,
                normalizer="cholqr2", range_finder="gram",
                gram_precision="default", fused_sketch=True,
                kernel_mesh=mesh,
                n_valid=n_true,
                cfg=("interp-mesh",),
            )
        np.testing.assert_allclose(np.asarray(st2["sigma"])[:6],
                                   np.asarray(st1["sigma"])[:6], rtol=2e-4)
        np.testing.assert_allclose(np.asarray(st2["means"]),
                                   np.asarray(st1["means"]),
                                   rtol=1e-4, atol=1e-5)
        tv1, tv2 = float(st1["total_variance"]), float(st2["total_variance"])
        assert abs(tv2 - tv1) / tv1 < 1e-5

    def test_state_shapes_independent_of_fused_path(self, interpret):
        """Serialized state must not depend on whether the Pallas kernel
        probe succeeded: the fused path's appended ones column is
        truncated after the projected SVD, so sigma/u/vt come out the
        same l-wide shape on every path and centering mode."""
        x = _data(4200, 64, offset=0.0)
        st = self._fit(x, fused=True, cfg=("interp-nc",))
        st_plain = self._fit(x, fused=False, cfg=("interp-plain",))
        stn = randomized_pca_fit(
            jnp.asarray(x), key_from_seed(11), n_components=6,
            normalizer="cholqr2", range_finder="gram",
            gram_precision="default", fused_sketch=True,
            centering=False, cfg=("interp-nc2",),
        )
        for name in ("sigma", "u", "vt"):
            assert st[name].shape == st_plain[name].shape
            assert stn[name].shape == st[name].shape
        assert np.all(np.asarray(stn["means"]) == 0)
