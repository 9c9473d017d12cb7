"""Fused sketch + moments streaming kernel.

The Gram range finder needs three more reductions over the n×d data
after the Gram pass: the sketch ``Y = X·W``, the column sums (means),
and ``‖X‖²_F`` (total variance).  XLA:TPU never fuses a reduce into a
dot's operand read, so the two VPU reductions cost a full extra HBM
pass beside any matmul they are siblings of (measured +5.7 ms at
1M×1024 f32 — `benchmarks/sibling_pass_ab.py`).  This kernel streams X
exactly once, computing the skinny matmul on the MXU and both VPU
reductions on the same block while it is VMEM-resident: measured
7.1 ms vs 11.5 ms for XLA's sketch + sibling pass at the flagship
point (the reductions are free — a sketch-only kernel measures the
same 7.2 ms; a hand-pipelined manual-DMA variant measured 6.8 ms and
was not worth its complexity).

The matmul runs as a hand-rolled 3-pass bf16×3 product (the
``precision="high"`` decomposition; see `_kernel` for why one-pass
bf16 is not accurate enough here even though it is fine for the Gram).
The column sums and ‖X‖² accumulate in f32 on the VPU (exact-grade:
these ARE user-visible as ``mean_`` and ``total_variance``).

Ragged row counts are handled in-kernel: the last block's
out-of-bounds rows are select-masked to zero before every consumer
(measured free: 7.19 ms masked vs 7.09 unmasked).

Replaces no reference component 1:1 — it is the TPU fusion of
pca.rs:531 (means / ``X − μ``), pca.rs:533 (‖X‖²_F), and pca.rs:707
(``Q = X·Ω``) into one data pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_sketch_moments", "supports", "kernel_available"]

_BM = 1024  # preferred rows per block
_VMEM_BUDGET = 12 * 1024 * 1024


def _block_rows(d: int, lp: int) -> int:
    """Largest block height whose double-buffered working set fits."""
    bm = _BM
    while bm >= 64:
        need = (2 * bm * d + 2 * bm * lp + d * lp + 2 * d) * 4
        if need <= _VMEM_BUDGET:
            return bm
        bm //= 2
    return 0


def supports(n: int, d: int, l: int, dtype) -> bool:
    """True when the kernel handles this problem profitably: f32 data,
    large enough that one saved HBM pass beats kernel overhead, and a
    block geometry that fits VMEM."""
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if l < 1 or l > 512:
        return False
    bm = _block_rows(d, ((l + 7) // 8) * 8)
    return bm > 0 and n >= 4 * bm


def _kernel(n: int, bm: int, ragged: bool, x_ref, w_ref, y_ref, cs_ref,
            sq_ref):
    i = pl.program_id(0)
    xb = x_ref[:]
    if ragged:
        # Out-of-bounds rows of the last block are unspecified memory;
        # select (not multiply — NaN-safe) them to zero.
        valid = jnp.int32(n) - i * bm
        rows = jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
        xb = jnp.where(rows < valid, xb, 0.0)
    # Hand-rolled 3-pass bf16×3 matmul ("high"-equivalent; Mosaic lowers
    # only DEFAULT/HIGHEST).  Measured free against the HBM stream
    # (7.0 ms vs 7.1 one-pass bf16, vs 9.0 six-pass HIGHEST) while
    # cutting sketch error 500× (4.7e-6 vs 2.3e-3 relative): sketch
    # noise lands OUTSIDE range(X) and, unlike Gram noise (which only
    # rotates the subspace iterate W — X·ΔW stays in-range), pollutes
    # the basis directly, so one-pass bf16 measurably degraded σ
    # (1.2e-4 vs 3.8e-6 flagship agreement with the direct finder).
    w = w_ref[:]
    xh = xb.astype(jnp.bfloat16)
    xl = (xb - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    y_ref[:] = (
        jnp.dot(xh, wh, preferred_element_type=jnp.float32)
        + jnp.dot(xl, wh, preferred_element_type=jnp.float32)
        + jnp.dot(xh, wl, preferred_element_type=jnp.float32)
    )
    cs = jnp.sum(xb, axis=0, keepdims=True)
    sq = jnp.sum(xb * xb)

    @pl.when(i == 0)
    def _init():
        cs_ref[:] = cs
        sq_ref[0, 0] = sq

    @pl.when(i != 0)
    def _acc():
        cs_ref[:] = cs_ref[:] + cs
        sq_ref[0, 0] = sq_ref[0, 0] + sq


# Test hook: force interpreter-mode execution (runs on CPU) so the
# kernel and its pipeline integration are exercised by the CPU suite.
_INTERPRET = False


def fused_sketch_moments(x, w):
    """``(Y, colsum, sqnorm)`` in one pass over ``x``.

    ``Y = x @ w`` at bf16/f32-accumulate, ``colsum = Σᵢ x[i, :]`` and
    ``sqnorm = Σ x²`` in f32.  ``x`` is (n, d) float32, ``w`` (d, l)
    float32.  Callers gate on :func:`supports` (per-shard rows under a
    mesh).  Inside a mesh trace (``replication.replicated_kernel_mesh``)
    the kernel runs per-shard under ``shard_map`` — row-sharded ``x``
    and ``y``, replicated ``w`` — and the two moment reductions finish
    with one ``psum`` each; zero-padded rows contribute nothing to any
    output, so uneven sharding needs no extra masking here.
    """
    from .replication import current_mesh

    return fused_sketch_moments_on(x, w, current_mesh())


def fused_sketch_moments_on(x, w, mesh):
    """:func:`fused_sketch_moments` with the mesh passed explicitly
    (``None`` = single device) instead of read from the ambient
    ``replicated_kernel_mesh`` context — for callers whose own jit cache
    key already encodes the mesh (``randomized_pca_fit``'s
    ``kernel_mesh`` static), so a context change cannot desynchronize
    from a cached trace."""
    return _fused_sketch_moments(x, w, mesh=mesh, interpret=_INTERPRET)


def _call_kernel(x, w, interpret: bool):
    n, d = x.shape
    l = w.shape[1]
    bm = _block_rows(d, ((l + 7) // 8) * 8)
    grid = -(-n // bm)
    ragged = n % bm != 0

    with jax.enable_x64(False):
        y, cs, sq = pl.pallas_call(
            functools.partial(_kernel, n, bm, ragged),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((bm, d), lambda i: (i, 0)),
                pl.BlockSpec((d, l), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bm, l), lambda i: (i, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((grid * bm, l), jnp.float32),
                jax.ShapeDtypeStruct((1, d), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            interpret=interpret,
        )(x, w)
    return y[:n], cs[0], sq[0, 0]


@functools.partial(jax.jit, static_argnames=("mesh", "interpret"))
def _fused_sketch_moments(x, w, *, mesh, interpret=False):
    if mesh is None:
        return _call_kernel(x, w, interpret)

    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def per_shard(xs, ws):
        y, cs, sq = _call_kernel(xs, ws, interpret)
        return (
            y,
            jax.lax.psum(cs, axis),
            jax.lax.psum(sq, axis),
        )

    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None)),
        out_specs=(P(axis, None), P(None), P()),
        # pallas_call's out_shape carries no varying-mesh-axes metadata,
        # so the vma checker cannot type the kernel's outputs.
        check_vma=False,
    )(x, w)


def _try_probe(run) -> bool:
    """Run an eager probe with one retry (transient remote-compile
    failures); any exception means "kernel unavailable here"."""
    for _ in range(2):
        try:
            jax.block_until_ready(run())
            return True
        except Exception:
            pass
    return False


_probe_result: bool | None = None


def kernel_available() -> bool:
    """One-time compile/run probe on the current backend (eager only)."""
    global _probe_result
    if _probe_result is not None:
        return _probe_result
    if jax.default_backend() == "cpu":
        _probe_result = False
        return False

    def run():
        x = jnp.ones((2080, 128), jnp.float32)  # ragged vs bm=1024
        w = jnp.ones((128, 7), jnp.float32)
        return fused_sketch_moments_on(x, w, None)

    _probe_result = _try_probe(run)
    return _probe_result


def probed() -> bool | None:
    """Probe result if it already ran (safe to consult under tracing)."""
    return _probe_result


_mesh_probe_results: dict = {}


def mesh_kernel_available(mesh) -> bool:
    """One-time compile/run probe of the per-shard ``shard_map`` path on
    ``mesh`` (eager only).  Separate from :func:`kernel_available`: the
    single-device kernel compiling does not guarantee the
    shard_map-wrapped variant does, and a probe failure must degrade the
    mesh fit to the kernel-free Gram flow instead of breaking it.

    The probe uses a geometry the real dispatch would accept — 4100
    rows per shard passes ``supports()`` (≥ 4·block) and exercises a
    multi-block grid with a ragged last block — and ships the host
    value through ``parallel.mesh.shard_rows``, which handles
    non-fully-addressable (multi-process) shardings."""
    if mesh in _mesh_probe_results:
        return _mesh_probe_results[mesh]
    ok = False
    if kernel_available():
        from ...parallel.mesh import shard_rows

        def run():
            import numpy as np

            n = 4100 * mesh.size  # per-shard: supports()-conformant
            x = shard_rows(np.ones((n, 128), np.float32), mesh)
            w = jnp.ones((128, 7), jnp.float32)
            return fused_sketch_moments_on(x, w, mesh)

        ok = _try_probe(run)
    _mesh_probe_results[mesh] = ok
    return ok
