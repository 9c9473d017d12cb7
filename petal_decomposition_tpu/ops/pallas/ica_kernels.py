"""Fused FastICA contrast-update kernel.

The hot loop of ``ica_par`` (ref: ica.rs:331-342) computes, per
iteration over the whitened data X₁ (k × n, n large):

    G   = g(W·X₁)            (k × n)
    s_i = Σ_j g′((W·X₁)_ij)  (k,)
    GX  = G·X₁ᵀ              (k × k)

Under XLA this materializes W·X₁ and G to HBM (two k×n buffers written
and re-read per iteration).  This kernel streams X₁ through VMEM in
column tiles and performs both MXU matmuls and the elementwise contrast
on-chip, so each iteration touches HBM exactly once (one read of X₁):

    per tile:  WX = W · X₁[:, tile]     (MXU)
               G  = g(WX), s += Σ g′(WX)  (VPU)
               GX += G · X₁[:, tile]ᵀ   (MXU)

Padded columns (X₁ zero-padded to the tile size) contribute g(0)=0 to
GX and g′(0) per column to s — exactly the correction already applied by
``_ica_par_core``'s ``n_valid`` accounting, so the same caller-side
adjustment covers both tile padding and shard padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ica_contrast_update", "supports"]

_LANE = 128
_DEF_TILE = 8192


def _apply_contrast(fun: str, wx):
    if fun == "logcosh":
        g = jnp.tanh(wx)
        gp = 1.0 - g * g
    elif fun == "exp":
        e = jnp.exp(-(wx * wx) * 0.5)
        g = wx * e
        gp = (1.0 - wx * wx) * e
    else:  # cube
        g = wx * wx * wx
        gp = 3.0 * wx * wx
    return g, gp


def _kernel(fun: str, w_ref, x_ref, gx_ref, gsum_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        gx_ref[:] = jnp.zeros(gx_ref.shape, gx_ref.dtype)
        gsum_ref[:] = jnp.zeros(gsum_ref.shape, gsum_ref.dtype)

    xt = x_ref[:]  # (k, bn)
    wx = jax.lax.dot_general(
        w_ref[:], xt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    g, gp = _apply_contrast(fun, wx)
    gsum_ref[:] += jnp.sum(gp, axis=1, keepdims=True)  # (k, 1)
    gx_ref[:] += jax.lax.dot_general(
        g, xt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# Budget must leave room for Pallas's automatic double-buffering of the
# streamed x tile (×2) plus compiler headroom under the ~16 MB/core.
_VMEM_BUDGET = 5 * 1024 * 1024


def _pick_tile(k: int, tile: int, n: int) -> int:
    """Largest lane-aligned tile with x/wx/g blocks + W within budget."""
    per_col = 3 * k * 4  # x tile + wx + g, f32
    cap = max(_LANE, (_VMEM_BUDGET - 2 * k * k * 4) // per_col)
    cap = (cap // _LANE) * _LANE
    want = min(tile, ((n + _LANE - 1) // _LANE) * _LANE)
    return max(_LANE, min(want, cap))


def supports(k: int, dtype) -> bool:
    """Kernel applicability: f32, lane-friendly k, and a workable VMEM
    footprint (W + a useful tile)."""
    return jnp.dtype(dtype) == jnp.float32 and k % 8 == 0 and 8 <= k <= 512


@functools.lru_cache(maxsize=1)
def kernel_available() -> bool:
    """One-time probe: can Mosaic compile and run this kernel on the
    current backend?  Keeps fits working (XLA fallback) on stacks where
    Pallas lowering is broken."""
    if jax.default_backend() == "cpu":
        return False
    try:
        w = jnp.eye(8, dtype=jnp.float32)
        x = jnp.ones((8, 128), jnp.float32)
        gx, gs = ica_contrast_update(w, x, fun="logcosh")
        jax.block_until_ready((gx, gs))
        return True
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("fun", "tile"))
def ica_contrast_update(w, x1, *, fun: str = "logcosh",
                        tile: int = _DEF_TILE):
    """Returns ``(GX, gsum)`` for the FastICA update in one HBM pass.

    ``x1`` is (k, n); n is padded internally to the tile size (padded
    columns follow the g′(0) convention above).
    """
    k, n = x1.shape
    bn = _pick_tile(k, tile, n)
    pad = (-n) % bn
    if pad:
        x1 = jnp.pad(x1, ((0, 0), (0, pad)))
    n_pad = x1.shape[1]

    # Mosaic fails to legalize kernels traced under jax_enable_x64 (the
    # i64 index types it injects don't lower); trace the kernel in a
    # local x64-off scope — all operands are f32, so numerics are
    # unaffected.
    with jax.enable_x64(False):
        gx, gsum = pl.pallas_call(
            functools.partial(_kernel, fun),
            grid=(n_pad // bn,),
            in_specs=[
                pl.BlockSpec((k, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, bn), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((k, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((k, k), jnp.float32),
                jax.ShapeDtypeStruct((k, 1), jnp.float32),
            ],
        )(w, x1)
    # Padded columns added g′(0) each; subtract them here so callers see
    # sums over the true n columns they passed in.
    g0 = {"logcosh": 1.0, "exp": 1.0, "cube": 0.0}[fun]
    gsum = gsum[:, 0] - pad * g0
    return gx, gsum
