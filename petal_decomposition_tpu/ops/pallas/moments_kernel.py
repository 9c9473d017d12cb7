"""Single-pass fused data-moments kernel: Gram + column sums + ‖X‖²_F.

The Gram-accelerated range finder (``distributed.randomized_pca_fit``
with ``range_finder="gram"``) needs three reductions over the n×d data:

* ``G = XᵀX``      (d×d, MXU)      — the subspace operator,
* ``s = 1ᵀX``      (d,   VPU)      — column sums → the mean,
* ``sq = ‖X‖²_F``  (scalar, VPU)   — the total variance,

which as separate XLA ops cost three full HBM passes (XLA does not
multi-output-fuse sibling consumers of one buffer into a single read).
This kernel computes all three in ONE streaming pass: the grid walks
row blocks, each block is read from HBM once, the MXU accumulates the
Gram at bf16 input precision (f32 accumulation) while the VPU
accumulates the f32 column sums and squared norm.

Precision contract: ``s`` and ``sq`` are f32-exact (VPU accumulation of
unrounded inputs — identical grade to ``jnp.sum``); ``G`` carries bf16
*input* rounding (~4e-3 relative) with f32 accumulation.  That grade is
sufficient for the range finder's SUBSPACE (the Rayleigh–Ritz recovery
against exact X makes singular values quadratically insensitive to
basis error) but NOT for direct eigenvalue reads — callers needing an
accurate Gram must use the XLA path.  ``n_passes=3`` upgrades G to
~f32-grade via the error-free bf16 split G ≈ HᵀH + HᵀL + LᵀH
(3× the MXU work, same single HBM pass).

The reference has no analogue: it materializes centered copies and
re-reads them per factorization (pca.rs:216, 531).  Row blocks of
zeros (sharding pad) contribute nothing to any of the three outputs,
so padded inputs need no masking here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["data_moments", "supports", "kernel_available", "probed"]

_VMEM_BUDGET = 14 * 1024 * 1024
_ROW_BLOCK = 512


def _block_rows(n: int, d: int) -> int:
    r = _ROW_BLOCK
    # G (d² f32) + double-buffered input block (2·r·d f32) + bf16 temps.
    while r > 8 and d * d * 4 + 2 * r * d * 4 + 2 * r * d * 2 > _VMEM_BUDGET:
        r //= 2
    return r


def supports(n: int, d: int, dtype) -> bool:
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if d % 128 != 0 or d == 0:
        return False
    r = _block_rows(n, d)
    if d * d * 4 + 2 * r * d * 4 + 2 * r * d * 2 > _VMEM_BUDGET:
        return False
    return n >= r  # at least one full block; remainder handled by caller


def _moments_kernel(n_passes: int, x_ref, g_ref, s_ref, sq_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        g_ref[...] = jnp.zeros_like(g_ref)
        s_ref[...] = jnp.zeros_like(s_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    xb = x_ref[...]  # (r, d) float32
    hi = xb.astype(jnp.bfloat16)
    contract = (((0,), (0,)), ((), ()))
    g = jax.lax.dot_general(
        hi, hi, contract, preferred_element_type=jnp.float32
    )
    if n_passes == 3:
        lo = (xb - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        g = g + jax.lax.dot_general(
            hi, lo, contract, preferred_element_type=jnp.float32
        )
        g = g + jax.lax.dot_general(
            lo, hi, contract, preferred_element_type=jnp.float32
        )
    g_ref[...] += g
    s_ref[...] += jnp.sum(xb, axis=0, keepdims=True)
    sq_ref[0, 0] += jnp.sum(xb * xb)


@functools.partial(jax.jit, static_argnames=("n_passes",))
def _moments_call(x, *, n_passes: int = 1):
    n, d = x.shape
    r = _block_rows(n, d)
    n0 = (n // r) * r
    body = functools.partial(_moments_kernel, n_passes)
    g, s, sq = pl.pallas_call(
        body,
        grid=(n0 // r,),
        in_specs=[
            pl.BlockSpec((r, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 2 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_passes * 2 * n0 * d * d + 3 * n0 * d,
            bytes_accessed=n0 * d * 4 + d * d * 4,
            transcendentals=0,
        ),
    )(x)
    if n0 != n:  # remainder rows (< r of them): plain XLA, negligible
        tail = x[n0:, :]
        hi = tail.astype(jnp.bfloat16)
        gt = jax.lax.dot_general(
            hi, hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if n_passes == 3:
            lo = (tail - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            gt = gt + jax.lax.dot_general(
                hi, lo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gt = gt + jax.lax.dot_general(
                lo, hi, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        g = g + gt
        s = s + jnp.sum(tail, axis=0, keepdims=True)
        sq = sq + jnp.sum(tail * tail)[None, None]
    return g, s[0], sq[0, 0]


def data_moments(x, *, n_passes: int = 1):
    """``(XᵀX, 1ᵀX, ‖X‖²_F)`` in one HBM pass.  Caller must check
    :func:`supports` first."""
    return _moments_call(x, n_passes=n_passes)


_PROBED: bool | None = None


def kernel_available() -> bool:
    """Eagerly probe the kernel once on a tiny input (compile + run)."""
    global _PROBED
    if _PROBED is None:
        try:
            x = jnp.ones((128, 128), jnp.float32)
            g, s, sq = _moments_call(x)
            ok = (
                abs(float(sq) - 128 * 128) < 1.0
                and abs(float(s[0]) - 128) < 1e-2
                and abs(float(g[0, 0]) - 128) < 1.0
            )
            _PROBED = bool(ok)
        except Exception:  # noqa: BLE001 — any compile/runtime failure
            _PROBED = False
    return _PROBED


def probed() -> bool | None:
    """Trace-safe availability: the last probe result (None = never
    probed; callers inside jit treat that as unavailable)."""
    return _PROBED
