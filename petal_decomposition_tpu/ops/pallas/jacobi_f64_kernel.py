"""VMEM-resident one-sided Jacobi SVD at f64 precision via df64 pairs.

TPU has no native f64 vector arithmetic; XLA's per-op emulation forces
the f64 Jacobi solve onto the dispatch-bound XLA formulation (~0.3 ms ×
~n·sweeps sequential steps ⇒ ~100 ms for 1000×64).  This kernel runs
the entire solve in one invocation using :mod:`.df64` double-single
arithmetic (unit roundoff ≈ 2⁻⁴⁸, verified bit-exact error-free
transforms under Mosaic), with the same structure as the f32 kernel in
:mod:`.jacobi_kernels`: left/right-half tournament pairing, static
slice/concat advance, all sweeps in-kernel.

Accuracy target: ~1e-13 relative factorization error — comfortably
inside the library's 1e-10 f64 parity band.  Range limits are f32's
(|x| ≲ 1e38); callers with wilder scales fall back to the XLA path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df64

__all__ = ["jacobi_svd_vmem_f64", "supports", "kernel_available"]

_VMEM_BUDGET = 10 * 1024 * 1024
# df64 working precision; the convergence tolerance leaves headroom so
# the sweep loop terminates (accuracy saturates near 2^-48).
_EPS = 2.0 ** -48
_TOL_EPS = 2.0 ** -46


def _svd_kernel(n: int, max_sweeps: int, tol: float, ah_ref, al_ref,
                oh_ref, ol_ref, vh_ref, vl_ref, off_ref):
    h = n // 2

    ah0, al0 = ah_ref[:], al_ref[:]
    m = ah0.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    vh0 = jnp.where(row == col, 1.0, 0.0).astype(jnp.float32)
    vl0 = jnp.zeros((n, n), jnp.float32)
    eps48 = jnp.float32(_EPS)

    def rotate_step(_, carry):
        ah, al, vh, vl, off = carry
        lh, ll = ah[:, :h], al[:, :h]
        rh, rl = ah[:, h:], al[:, h:]
        app_h, app_l = df64.dot0(lh, ll, lh, ll)
        aqq_h, aqq_l = df64.dot0(rh, rl, rh, rl)
        apq_h, apq_l = df64.dot0(lh, ll, rh, rl)

        # Convergence measure + skip mask from the hi parts (f32 is
        # plenty to *detect* smallness at the 2^-48 scale relatively).
        # Norm-wise measure (vs the largest column norm²): pairwise-
        # relative stalls on numerically-zero columns (rank deficiency).
        scale_f = jnp.sqrt(jnp.maximum(app_h * aqq_h, 0.0))
        norm2max = jnp.maximum(jnp.max(app_h), jnp.max(aqq_h))
        rel = jnp.abs(apq_h) / jnp.where(norm2max > 0, norm2max, 1.0)
        off = jnp.maximum(off, jnp.max(rel))
        skip = jnp.abs(apq_h) <= eps48 * scale_f

        sgn = jnp.where(apq_h >= 0, 1.0, -1.0).astype(jnp.float32)
        absq_h = jnp.where(skip, 1.0, apq_h * sgn)
        absq_l = jnp.where(skip, 0.0, apq_l * sgn)

        # tau = (aqq − app) / (2|apq|)     (df64 throughout)
        num_h, num_l = df64.sub(aqq_h, aqq_l, app_h, app_l)
        tau_h, tau_l = df64.div(num_h, num_l, 2.0 * absq_h, 2.0 * absq_l)
        # t = sign(tau) / (|tau| + √(1 + tau²))
        tsgn = jnp.where(tau_h >= 0, 1.0, -1.0).astype(jnp.float32)
        at_h, at_l = tau_h * tsgn, tau_l * tsgn
        t2_h, t2_l = df64.mul(tau_h, tau_l, tau_h, tau_l)
        opt_h, opt_l = df64.add(t2_h, t2_l, jnp.float32(1.0),
                                jnp.float32(0.0))
        sq_h, sq_l = df64.sqrt(opt_h, opt_l)
        den_h, den_l = df64.add(at_h, at_l, sq_h, sq_l)
        t_h, t_l = df64.div(tsgn, jnp.zeros_like(tsgn), den_h, den_l)
        tau_zero = (tau_h == 0) & (tau_l == 0)
        t_h = jnp.where(tau_zero, 1.0, t_h)
        t_l = jnp.where(tau_zero, 0.0, t_l)
        t_h = jnp.where(skip, 0.0, t_h)
        t_l = jnp.where(skip, 0.0, t_l)
        # c = 1/√(1 + t²);  s = c·t·sign(apq)
        ct2_h, ct2_l = df64.mul(t_h, t_l, t_h, t_l)
        cd_h, cd_l = df64.add(ct2_h, ct2_l, jnp.float32(1.0),
                              jnp.float32(0.0))
        csq_h, csq_l = df64.sqrt(cd_h, cd_l)
        c_h, c_l = df64.div(jnp.ones_like(csq_h), jnp.zeros_like(csq_h),
                            csq_h, csq_l)
        s_h, s_l = df64.mul(c_h, c_l, t_h, t_l)
        s_h, s_l = s_h * sgn, s_l * sgn

        def rot_advance(xh, xl, width):
            yl_h, yl_l = xh[:, :h], xl[:, :h]
            yr_h, yr_l = xh[:, h:], xl[:, h:]
            cl_h, cl_l = df64.mul(yl_h, yl_l, c_h[None, :], c_l[None, :])
            sr_h, sr_l = df64.mul(yr_h, yr_l, s_h[None, :], s_l[None, :])
            nl_h, nl_l = df64.sub(cl_h, cl_l, sr_h, sr_l)
            sl_h, sl_l = df64.mul(yl_h, yl_l, s_h[None, :], s_l[None, :])
            cr_h, cr_l = df64.mul(yr_h, yr_l, c_h[None, :], c_l[None, :])
            nr_h, nr_l = df64.add(sl_h, sl_l, cr_h, cr_l)
            if h == 1:
                return (
                    jnp.concatenate([nl_h, nr_h], axis=1),
                    jnp.concatenate([nl_l, nr_l], axis=1),
                )
            # tournament advance: [L0, R0, L1..L_{h-2} | R1.., L_{h-1}]
            # (middle slice empty at h == 2 — skip it; Mosaic cannot
            # type zero-width vectors)
            def adv(nl, nr):
                parts = [nl[:, 0:1], nr[:, 0:1]]
                if h > 2:
                    parts.append(nl[:, 1 : h - 1])
                parts.extend([nr[:, 1:], nl[:, h - 1 : h]])
                return jnp.concatenate(parts, axis=1)

            return adv(nl_h, nr_h), adv(nl_l, nr_l)

        ah, al = rot_advance(ah, al, m)
        vh, vl = rot_advance(vh, vl, n)
        return ah, al, vh, vl, off

    def sweep(_, state):
        ah, al, vh, vl, off, done = state

        def run():
            ah2, al2, vh2, vl2, off2 = jax.lax.fori_loop(
                0, n - 1, rotate_step, (ah, al, vh, vl, jnp.float32(0.0))
            )
            return ah2, al2, vh2, vl2, off2, off2 <= tol

        return jax.lax.cond(
            done, lambda: (ah, al, vh, vl, off, done), run
        )

    ah, al, vh, vl, off, _ = jax.lax.fori_loop(
        0, max_sweeps,
        sweep,
        (ah0, al0, vh0, vl0, jnp.float32(jnp.inf), False),
    )
    oh_ref[:] = ah
    ol_ref[:] = al
    vh_ref[:] = vh
    vl_ref[:] = vl
    off_ref[0, 0] = off


def supports(m: int, n: int, dtype) -> bool:
    if jnp.dtype(dtype) != jnp.float64:
        return False
    if n < 2:
        return False
    n_pad = n + (n % 2)
    # Scoped-VMEM stack bound: Mosaic lane-pads every (m, w) temporary
    # to 128 lanes and its allocator reported needing ~17.8 live such
    # f32 buffers for a 2000×18 panel (18.21 MB against the 16 MB
    # scoped limit — found by a TPU shape sweep).  Requiring 18 padded
    # buffers to fit caps m·max(n_pad, 128) at ~233k, which subsumes
    # the earlier empirical 400k padded-element cap.
    if 18 * m * max(n_pad, 128) * 4 > 16 * 1024 * 1024:
        return False
    working = (8 * m * n_pad + 8 * n_pad * n_pad) * 4
    return working <= _VMEM_BUDGET


def jacobi_svd_vmem_f64(a, *, max_sweeps: int = 30):
    """One-sided Jacobi on the columns of ``a`` (m×n f64), entirely in
    one kernel at df64 precision.  Returns ``(a_rot, v, off)`` as f64
    arrays, matching ``_jacobi_svd_core``'s contract.

    The active replicated-kernel mesh (if any) is folded into the jit
    cache key (see jacobi_kernels.jacobi_svd_vmem)."""
    from .replication import current_mesh

    return _jacobi_svd_vmem_f64(
        a, max_sweeps=max_sweeps, mesh=current_mesh()
    )


@functools.partial(jax.jit, static_argnames=("max_sweeps", "mesh"))
def _jacobi_svd_vmem_f64(a, *, max_sweeps: int, mesh):
    m, n = a.shape
    padded = n % 2 == 1
    if padded:
        a = jnp.pad(a, ((0, 0), (0, 1)))
        n += 1
    tol = float(_TOL_EPS) * float(np.sqrt(max(m, n)))

    ah, al = df64.split_f64(a)

    def _call(ah32, al32):
        with jax.enable_x64(False):
            oh, ol, vh, vl, off = pl.pallas_call(
                functools.partial(_svd_kernel, n, max_sweeps, tol),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
                + [pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_shape=[
                    jax.ShapeDtypeStruct((m, n), jnp.float32),
                    jax.ShapeDtypeStruct((m, n), jnp.float32),
                    jax.ShapeDtypeStruct((n, n), jnp.float32),
                    jax.ShapeDtypeStruct((n, n), jnp.float32),
                    jax.ShapeDtypeStruct((1, 1), jnp.float32),
                ],
            )(ah32, al32)
        return oh, ol, vh, vl, off

    # Under a mesh trace the kernel runs replicated per-device via
    # shard_map (pallas_call alone has no GSPMD partitioning rule).
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        _call = jax.shard_map(
            _call, mesh=mesh, in_specs=P(),
            out_specs=(P(), P(), P(), P(), P()), check_vma=False,
        )
    oh, ol, vh, vl, off = _call(ah, al)

    a_rot = df64.join_f64(oh, ol)
    v = df64.join_f64(vh, vl)
    if padded:
        a_rot = a_rot[:, :-1]
        v = v[:-1, :-1]
    return a_rot, v, off[0, 0].astype(jnp.float64)


_probe_result: bool | None = None


def kernel_available() -> bool:
    """One-time compile/run probe (eager context only)."""
    global _probe_result
    if _probe_result is not None:
        return _probe_result
    if jax.default_backend() == "cpu":
        _probe_result = False
        return False
    # One retry: transient remote-compile failures must not pin the slow
    # path for the whole process.
    for _ in range(2):
        try:
            x = jnp.asarray(np.eye(8) + 0.1, jnp.float64)
            out = jacobi_svd_vmem_f64(x, max_sweeps=2)
            jax.block_until_ready(out)
            _probe_result = True
            break
        except Exception:
            _probe_result = False
    return _probe_result


def probed() -> bool | None:
    return _probe_result
