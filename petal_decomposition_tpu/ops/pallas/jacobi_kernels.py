"""VMEM-resident one-sided Jacobi SVD kernel.

The XLA formulation of the Jacobi solve (:mod:`..jacobi`) runs ~n·sweeps
sequential rotation steps, each a separate device op — on TPU that is
dispatch-latency-bound (~0.3 ms/step ⇒ ~150 ms for a 1000×64 solve).
This kernel keeps the whole problem resident in VMEM and runs every
rotation step and sweep inside ONE kernel invocation, eliminating the
per-step dispatch entirely.

Design:

* **Pairing without gathers**: columns live as [left half | right half];
  step pairs are (Lᵢ, Rᵢ) — contiguous VMEM slices, vectorized over all
  n/2 pairs on the VPU.  The round-robin tournament advance is a single
  STATIC column permutation (the same one every step), compiled as a
  constant shuffle; column order is restored at the end of each sweep
  with a second static permutation.
* **All sweeps in-kernel**: ``fori_loop`` over a fixed sweep budget with
  each sweep gated on the convergence measure (skipped once converged);
  the final relative off-diagonal is returned for the caller's
  ``LinalgError`` check.
* f32 only (the TPU vector unit is f32; the f64 parity path stays on
  the XLA formulation).

Used for SVDs whose m×n working set fits the VMEM budget — which covers
the exact-PCA parity shapes, every randomized-SVD projected matrix B,
and (via PSD eigh = one-sided Jacobi on the symmetric matrix itself)
the ICA decorrelation and whitening eigenproblems.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["jacobi_svd_vmem", "supports", "kernel_available"]

_VMEM_BUDGET = 10 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _tournament_perms(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(step_perm, restore_perm) for the left/right-half tournament.

    Positions: [L0..Lh-1, R0..Rh-1], pair i = (Li, Ri), h = n/2.  The
    circle method fixes L0 and rotates every other position one place:
    new L1 ← R0, new Li ← Li-1, new Ri ← Ri+1, new Rh-1 ← Lh-1.
    ``step_perm[j]`` is the OLD index that lands at position j.  After
    n-1 steps, ``restore_perm`` maps positions back to column ids.
    """
    h = n // 2
    perm = np.empty(n, dtype=np.int32)
    perm[0] = 0
    if h > 1:
        perm[1] = h  # L1 <- R0
        for i in range(2, h):
            perm[i] = i - 1
    for i in range(h - 1):
        perm[h + i] = h + i + 1
    perm[n - 1] = h - 1
    # Accumulate the permutation over n-1 steps to build the restore map.
    pos = np.arange(n, dtype=np.int32)
    for _ in range(n - 1):
        pos = pos[perm]
    # pos[j] = original column at position j after a sweep; restoring is
    # exactly gathering with pos^{-1}? No: gathering columns with `pos`
    # yields original order ... a_restored[:, j] = a[:, inv[j]] where
    # inv[pos[j]] = j.  We need, for each target original column c, the
    # position where it ended: inv_pos with inv_pos[pos[j]] = j.
    inv = np.empty(n, dtype=np.int32)
    inv[pos] = np.arange(n, dtype=np.int32)
    return perm, inv


def _svd_kernel(n: int, max_sweeps: int, tol: float, a_ref, arot_ref, v_ref,
                off_ref):
    h = n // 2

    a0 = a_ref[:]
    m = a0.shape[0]
    eps = jnp.float32(np.float32(np.finfo(np.float32).eps))
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    v0 = jnp.where(row == col, 1.0, 0.0).astype(jnp.float32)

    def rotate_step(_, carry):
        a, v, off = carry
        l, r = a[:, :h], a[:, h:]
        app = jnp.sum(l * l, axis=0)
        aqq = jnp.sum(r * r, axis=0)
        apq = jnp.sum(l * r, axis=0)
        scale = jnp.sqrt(app * aqq)
        # Norm-wise convergence measure (vs the largest column norm²):
        # a pairwise-relative measure stalls on numerically-zero columns.
        norm2max = jnp.maximum(jnp.max(app), jnp.max(aqq))
        rel = jnp.abs(apq) / jnp.where(norm2max > 0, norm2max, 1.0)
        off = jnp.maximum(off, jnp.max(rel))
        skip = jnp.abs(apq) <= eps * scale
        sgn = jnp.where(apq >= 0, 1.0, -1.0)
        absq = jnp.where(skip, 1.0, jnp.abs(apq))
        tau = (aqq - app) / (2.0 * absq)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0, 1.0, t)
        t = jnp.where(skip, 0.0, t * sgn)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = c * t
        cb, sb = c[None, :], s[None, :]

        def rot_advance(x):
            """Rotate all pairs, then advance the tournament: the
            circle-method permutation expressed as static slices, so no
            gather/constant-index ops are needed.  Column order is never
            restored — rotations are order-agnostic and the caller's
            σ-sort aligns outputs."""
            xl, xr = x[:, :h], x[:, h:]
            nl = cb * xl - sb * xr
            nr = sb * xl + cb * xr
            if h == 1:
                return jnp.concatenate([nl, nr], axis=1)
            # new L = [L0, R0, L1..L_{h-2}];  new R = [R1.., L_{h-1}].
            # The middle slice is empty when h == 2 — skip it (Mosaic
            # cannot type zero-width vectors).
            parts = [nl[:, 0:1], nr[:, 0:1]]
            if h > 2:
                parts.append(nl[:, 1 : h - 1])
            parts.extend([nr[:, 1:], nl[:, h - 1 : h]])
            return jnp.concatenate(parts, axis=1)

        return rot_advance(a), rot_advance(v), off

    def sweep(_, state):
        a, v, off, done = state

        def run():
            a2, v2, off2 = jax.lax.fori_loop(
                0, n - 1, rotate_step, (a, v, jnp.float32(0.0))
            )
            return a2, v2, off2, off2 <= tol

        return jax.lax.cond(done, lambda: (a, v, off, done), run)

    a, v, off, _ = jax.lax.fori_loop(
        0, max_sweeps,
        sweep,
        (a0, v0, jnp.float32(jnp.inf), False),
    )
    arot_ref[:] = a
    v_ref[:] = v
    off_ref[0, 0] = off


def supports(m: int, n: int, dtype) -> bool:
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if n < 2:
        return False
    n_pad = n + (n % 2)
    # Mosaic lane-pads every (m, w) temporary to 128 lanes, and the loop
    # body keeps tens of them live, so the honest budget is on the
    # PADDED element count (empirically: 20000×4 f64 pairs blew a 128 MB
    # vmem accounting at 180 MB; 2048×128 and 512×512 compile fine).
    if m * max(n_pad, 128) > 400_000:
        return False
    working = (3 * m * n_pad + 3 * n_pad * n_pad) * 4
    return working <= _VMEM_BUDGET


def jacobi_svd_vmem(a, *, max_sweeps: int = 30):
    """One-sided Jacobi on the columns of ``a`` (m×n f32), entirely in
    one kernel.  Returns ``(a_rot, v, off)`` matching the contract of
    the XLA ``_jacobi_svd_core`` (columns of a_rot are uᵢ·σᵢ).

    The active replicated-kernel mesh (if any) is folded into the jit
    cache key: a trace made without shard_map must never be reused
    inside a mesh trace."""
    from .replication import current_mesh

    return _jacobi_svd_vmem(a, max_sweeps=max_sweeps, mesh=current_mesh())


@functools.partial(jax.jit, static_argnames=("max_sweeps", "mesh"))
def _jacobi_svd_vmem(a, *, max_sweeps: int, mesh):
    m, n = a.shape
    padded = n % 2 == 1
    if padded:
        a = jnp.pad(a, ((0, 0), (0, 1)))
        n += 1
    tol = float(np.finfo(np.float32).eps) * float(np.sqrt(max(m, n)))

    def _call(a32):
        with jax.enable_x64(False):
            arot, v, off = pl.pallas_call(
                functools.partial(_svd_kernel, n, max_sweeps, tol),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((m, n), jnp.float32),
                    jax.ShapeDtypeStruct((n, n), jnp.float32),
                    jax.ShapeDtypeStruct((1, 1), jnp.float32),
                ],
            )(a32)
        return arot, v, off

    # Under a mesh trace the kernel runs replicated per-device via
    # shard_map (pallas_call alone has no GSPMD partitioning rule).
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        _call = jax.shard_map(
            _call, mesh=mesh, in_specs=P(), out_specs=(P(), P(), P()),
            check_vma=False,
        )
    arot, v, off = _call(a.astype(jnp.float32))

    if padded:
        arot = arot[:, :-1]
        v = v[:-1, :-1]
    return arot, v, off[0, 0]


_probe_result: bool | None = None


def kernel_available() -> bool:
    """One-time compile/run probe on the current backend.  Must be
    called in an eager context."""
    global _probe_result
    if _probe_result is not None:
        return _probe_result
    if jax.default_backend() == "cpu":
        _probe_result = False
        return False
    # One retry: the remote compile service can fail transiently, and a
    # cached False would silently pin the slow path for the process.
    for _ in range(2):
        try:
            x = jnp.ones((8, 8), jnp.float32)
            arot, v, off = jacobi_svd_vmem(x, max_sweeps=2)
            jax.block_until_ready((arot, v, off))
            _probe_result = True
            break
        except Exception:
            _probe_result = False
    return _probe_result


def probed() -> bool | None:
    """Probe result if it already ran (safe to consult under tracing)."""
    return _probe_result
