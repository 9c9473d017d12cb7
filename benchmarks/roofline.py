"""Honest single-chip roofline: measured MXU and HBM ceilings.

Round-2's envelope probes timed ONE matmul per dispatch through the
remote-TPU tunnel, so the ~10-20 ms dispatch/sync cost was folded into a
15 ms measurement — useless for resolving a ceiling.  This harness fixes
that two ways:

* every measured kernel runs N times inside ONE jitted ``fori_loop``
  with a genuine data dependency between iterations (so XLA can neither
  hoist the op out of the loop nor dead-code it);
* each configuration is timed at N and 2N iterations and the ceiling is
  computed from the DIFFERENCE, cancelling whatever constant dispatch +
  transfer-flush cost remains.

Three kernel families cover the fit pipelines' operating points:

* square matmul chains (the MXU ceiling) per precision
  (``default`` = bf16 inputs / f32 accumulate, ``high`` = 3-pass bf16,
  ``highest`` = 6-pass bf16) and per size;
* a skinny power-iteration chain ``w ← (Xᵀ(X·w))/n`` at the flagship
  shape (the HBM streaming ceiling — 2 full-data passes per iteration);
* a Gram batch — K Grams of K DISTINCT static row-slices of X summed
  through ``sum(|G|)`` (distinct slices defeat CSE/LICM; the nonlinear
  |·| defeats the ``sum(AᵀB) = rowsum(A)·rowsum(B)`` factorization and
  slicing-DCE that silently reduced a consumed-at-one-element Gram to a
  single column dot product in the first version of this harness).

Anti-measurement-artifact rules learned here the hard way: consume
EVERY element of each measured op through a nonlinearity, never a
slice (XLA computes just the slice); keep a data dependence through
a nonlinearity between chained dots (XLA otherwise reassociates
``Xᵀ(Xw) → (XᵀX)w`` and hoists the loop-invariant Gram).

Usage: ``PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/roofline.py``
Writes benchmarks/ROOFLINE.json and prints it.
"""

from __future__ import annotations

# Repo-root import path for source checkouts, however this file is run
# (script, package import, or runpy without package context).
import os as _os
import sys as _sys

if not any(
    _os.path.isdir(_os.path.join(p, "petal_decomposition_tpu"))
    for p in _sys.path if p
):
    _sys.path.insert(
        0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
del _os, _sys
import functools
import json
import os
import time

import petal_decomposition_tpu  # noqa: F401  (x64 + config first)

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 1_000_000
N_COLS = 1024
L = 42

V5E_BF16_PEAK = 197e12
V5E_HBM_PEAK = 819e9


def _flush(x) -> None:
    # A tiny device→host transfer is the only reliable queue flush on
    # the tunnel stack (block_until_ready alone does not drain it).
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def _time_once(fn, *args) -> float:
    t0 = time.perf_counter()
    r = fn(*args)
    _flush(r if not isinstance(r, tuple) else r[0])
    return time.perf_counter() - t0


def _timed(fn, *args, reps: int = 3) -> float:
    r = fn(*args)  # compile + warm
    _flush(r if not isinstance(r, tuple) else r[0])
    return min(_time_once(fn, *args) for _ in range(reps))


def dispatch_overhead() -> float:
    """Round-trip cost of a trivial dispatch + flush (tunnel tax)."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    return _timed(f, x, reps=5)


def square_chain(n: int, precision: str, dtype, n_iter: int) -> float:
    """Seconds per n×n×n matmul, dispatch-free (2N−N differencing).

    Arrays are jit ARGUMENTS, never closure constants: a closed-over
    device array is embedded in the HLO and shipped with the remote
    compile request (a 268 MB payload at 8192² — HTTP 413).
    """
    key = jax.random.key(0)
    # Scale so the chained spectral norm stays bounded: ‖B‖₂ ≈ 2 for
    # N(0,1/n) entries → growth 2^iters, safely inside f32 range.
    b = (jax.random.normal(key, (n, n), jnp.float32) / np.sqrt(n)).astype(
        dtype
    )

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(c, b, *, iters):
        def body(_, c):
            return jnp.dot(c, b, precision=precision)

        return jax.lax.fori_loop(0, iters, body, c)

    t1 = _timed(functools.partial(run, iters=n_iter), b, b)
    t2 = _timed(functools.partial(run, iters=2 * n_iter), b, b)
    return max(t2 - t1, 1e-9) / n_iter


def streaming_chain(n: int, d: int, l: int, precision: str,
                    n_iter: int) -> float:
    """Seconds per power iteration ``w ← Xᵀ(X·w)/n`` (2 data passes)."""
    x = jax.random.normal(jax.random.key(1), (n, d), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(w, x, *, iters):
        def body(_, w):
            y = jnp.dot(x, w, precision=precision)
            # The clamp is a no-op on the data but blocks XLA from
            # reassociating Xᵀ(Xw) → (XᵀX)w and hoisting the Gram.
            y = jnp.maximum(y, jnp.float32(-1e30))
            return jnp.dot(x.T, y, precision=precision) / n

        return jax.lax.fori_loop(0, iters, body, w)

    w = jax.random.normal(jax.random.key(2), (d, l), jnp.float32)
    t1 = _timed(functools.partial(run, iters=n_iter), w, x)
    t2 = _timed(functools.partial(run, iters=2 * n_iter), w, x)
    return max(t2 - t1, 1e-9) / n_iter


def read_chain(n: int, d: int, n_iter: int) -> float:
    """Seconds per fused read-reduce pass ``sum(|X + s|)`` (4 B/elt
    read, nothing written — the pure-read bandwidth ceiling)."""
    x = jax.random.normal(jax.random.key(1), (n, d), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(s, x, *, iters):
        def body(_, s):
            return jnp.sum(jnp.abs(x + s)) * 1e-30

        return jax.lax.fori_loop(0, iters, body, s)

    s = jnp.float32(0)
    t1 = _timed(functools.partial(run, iters=n_iter), s, x)
    t2 = _timed(functools.partial(run, iters=2 * n_iter), s, x)
    return max(t2 - t1, 1e-9) / n_iter


def gram_batch(n: int, d: int, precision: str, k_max: int = 8) -> float:
    """Seconds per Gram contraction ``XᵀX`` (d×d output, n-deep).

    K distinct static row-slices (offsets 0..K-1, length n−k_max) give
    K non-CSE-able Grams inside one jit; ``sum(|G|)`` consumes every
    element through a nonlinearity.  K vs K/2 differencing removes the
    dispatch constant."""
    x = jax.random.normal(jax.random.key(1), (n, d), jnp.float32)
    rows = n - k_max

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(x, *, k):
        tot = jnp.float32(0)
        for i in range(k):
            xi = jax.lax.slice_in_dim(x, i, i + rows, axis=0)
            g = jnp.dot(xi.T, xi, precision=precision)
            tot = tot + jnp.sum(jnp.abs(g))
        return tot

    t1 = _timed(functools.partial(run, k=k_max // 2), x)
    t2 = _timed(functools.partial(run, k=k_max), x)
    return max(t2 - t1, 1e-9) / (k_max // 2)


def main() -> None:
    dev = jax.devices()[0]
    out: dict = {"device": str(dev), "method": "2N-N fori_loop differencing"}
    out["dispatch_overhead_ms"] = round(dispatch_overhead() * 1e3, 2)

    mxu = {}
    for n in (2048, 4096, 8192):
        for precision, dtype, tag in (
            ("default", jnp.bfloat16, "bf16"),
            ("default", jnp.float32, "f32_default"),
            ("high", jnp.float32, "f32_high"),
            ("highest", jnp.float32, "f32_highest"),
        ):
            iters = {2048: 256, 4096: 48, 8192: 12}[n]
            dt = square_chain(n, precision, dtype, iters)
            tflops = 2 * n**3 / dt / 1e12
            mxu[f"{tag}_{n}"] = {
                "ms": round(dt * 1e3, 3),
                "tflops": round(tflops, 1),
                "pct_of_bf16_peak": round(tflops * 1e12 / V5E_BF16_PEAK * 100, 1),
            }
    out["mxu_ceiling"] = mxu

    stream = {}
    for precision in ("default", "highest"):
        dt = streaming_chain(N_ROWS, N_COLS, L, precision, 6)
        gbps = 2 * N_ROWS * N_COLS * 4 / dt / 1e9
        stream[f"power_iter_1Mx1024x{L}_{precision}"] = {
            "ms": round(dt * 1e3, 2),
            "hbm_gbps_2pass": round(gbps, 1),
            "pct_of_hbm_peak": round(gbps * 1e9 / V5E_HBM_PEAK * 100, 1),
        }
    t_read = read_chain(N_ROWS, N_COLS, 6)
    stream["read_reduce_1Mx1024"] = {
        "ms": round(t_read * 1e3, 2),
        "hbm_gbps_read": round(N_ROWS * N_COLS * 4 / t_read / 1e9, 1),
        "pct_of_hbm_peak": round(
            N_ROWS * N_COLS * 4 / t_read / V5E_HBM_PEAK * 100, 1
        ),
    }
    out["hbm_ceiling"] = stream

    gram = {}
    for precision in ("default", "high", "highest"):
        dt = gram_batch(N_ROWS, N_COLS, precision)
        tflops = 2 * N_ROWS * N_COLS**2 / dt / 1e12
        gram[f"gram_1Mx1024_{precision}"] = {
            "ms": round(dt * 1e3, 2),
            "tflops": round(tflops, 1),
            "pct_of_bf16_peak": round(tflops * 1e12 / V5E_BF16_PEAK * 100, 1),
        }
    out["gram"] = gram

    path = os.path.join(os.path.dirname(__file__), "ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
