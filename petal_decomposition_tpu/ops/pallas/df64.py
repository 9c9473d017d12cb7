"""Double-single ("df64") arithmetic for Pallas TPU kernels.

TPU vector units are f32-only; XLA emulates f64 per-op, which is
accurate but forces the Jacobi solves back onto the dispatch-bound XLA
formulation (~0.3 ms per rotation step).  These primitives implement
~f64-precision arithmetic (unit roundoff ≈ 2⁻⁴⁸) from pairs of f32
values using error-free transforms (Knuth two-sum, Dekker split/product)
— verified bit-exact under Mosaic compilation on this stack — so the
whole f64 solve can run inside one VMEM-resident kernel.

Every value is an (hi, lo) pair of same-shape f32 arrays with
|lo| ≤ ulp(hi)/2.  Range limits are f32's (|x| ≲ 3e38, precision loss
below ~1e-38); fine for data matrices, documented at the call sites.

References: Dekker (1971); Hida/Li/Bailey's double-double (the float32
specialization is commonly called float-float or df64 in GPU computing).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "split_f64",
    "join_f64",
    "two_sum",
    "quick_two_sum",
    "two_prod",
    "add",
    "sub",
    "mul",
    "div",
    "sqrt",
    "scale",
    "sum0",
    "dot0",
]

_SPLITTER = 4097.0  # 2^12 + 1 for binary32


def split_f64(x):
    """f64 array → (hi, lo) f32 pair with hi + lo == x to f32-pair
    precision.  Runs in XLA (outside the kernel)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def join_f64(hi, lo):
    """(hi, lo) f32 pair → f64 array (outside the kernel)."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """Requires |a| >= |b| (or a == 0)."""
    s = a + b
    return s, b - (s - a)


def _dekker_split(a):
    c = jnp.float32(_SPLITTER) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    p = a * b
    ahi, alo = _dekker_split(a)
    bhi, blo = _dekker_split(b)
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


def add(xh, xl, yh, yl):
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return quick_two_sum(s, e)


def sub(xh, xl, yh, yl):
    return add(xh, xl, -yh, -yl)


def mul(xh, xl, yh, yl):
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return quick_two_sum(p, e)


def scale(xh, xl, c):
    """Multiply by an exact f32 scalar/array ``c``."""
    p, e = two_prod(xh, c)
    e = e + xl * c
    return quick_two_sum(p, e)


def div(xh, xl, yh, yl):
    """One Newton refinement over the f32 quotient: ~df64 accuracy."""
    q0 = xh / yh
    # r = x − q0·y  (df64)
    p_h, p_l = scale(yh, yl, q0)
    r_h, r_l = sub(xh, xl, p_h, p_l)
    q1 = (r_h + r_l) / yh
    return quick_two_sum(q0, q1)


def sqrt(xh, xl):
    """df64 square root via one Newton step on the f32 estimate:
    y ≈ y0 + (x − y0²) / (2 y0)."""
    y0 = jnp.sqrt(xh)
    y0 = jnp.where(xh > 0, y0, 0.0)
    p_h, p_l = two_prod(y0, y0)
    r_h, r_l = sub(xh, xl, p_h, p_l)
    denom = 2.0 * y0
    corr = jnp.where(
        denom > 0, (r_h + r_l) / jnp.where(denom > 0, denom, 1), 0.0
    )
    return quick_two_sum(y0, corr)


def sum0(ph, pl):
    """df64 sum along axis 0 via a pairwise two_sum tree (vectorized
    across the remaining axes).  Static shapes only.  Odd sizes fold the
    trailing row into row 0 before halving (never producing zero-sized
    slices, which Mosaic cannot type)."""
    while ph.shape[0] > 1:
        m = ph.shape[0]
        if m % 2:
            th, tl = add(ph[:1], pl[:1], ph[-1:], pl[-1:])
            if m > 2:
                ph = jnp.concatenate([th, ph[1:-1]], axis=0)
                pl = jnp.concatenate([tl, pl[1:-1]], axis=0)
            else:
                ph, pl = th, tl
                break
            m -= 1
        half = m // 2
        ph, pl = add(ph[:half], pl[:half], ph[half:], pl[half:])
    return ph[0], pl[0]


def dot0(ah, al, bh, bl):
    """df64 dot product along axis 0 of two df64 arrays."""
    ph, pl = mul(ah, al, bh, bl)
    return sum0(ph, pl)
