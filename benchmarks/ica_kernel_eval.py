"""Settle the fused ICA Pallas kernel with data (round-2 VERDICT #6).

Measures the jitted ``_ica_par_core`` iteration rate with the fused
Pallas contrast-update kernel ON vs OFF at the regimes where
materializing G = tanh(W·X₁) (k×n) in HBM should bind:
k ∈ {64, 256, 512} at n ∈ {500k, 1M} f32.  The winner per regime is
wired into ``resolve_use_pallas`` (or the kernel is deleted if it never
wins).  Writes benchmarks/ICA_KERNEL_EVAL.json.
"""

from __future__ import annotations

import json
import os
import time

import petal_decomposition_tpu  # noqa: F401  (x64 + config first)
from petal_decomposition_tpu import config as _cfg_mod
from petal_decomposition_tpu.models.fast_ica import _ica_par_core
from petal_decomposition_tpu.ops.pallas import ica_kernels

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30


def _rate(k: int, n: int, use_pallas: bool) -> float:
    x1 = jax.random.normal(jax.random.key(1), (k, n), jnp.float32)
    w0 = jax.random.normal(jax.random.key(2), (k, k), jnp.float32)
    tol = jnp.asarray(1e-12, jnp.float32)

    def run():
        w, _, _ = _ica_par_core(
            x1, tol, ITERS, w0, "logcosh", use_pallas=use_pallas
        )
        np.asarray(w).ravel()[:1]

    run()  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return ITERS / min(ts)


def main() -> None:
    assert ica_kernels.kernel_available(), "kernel probe failed"
    out = {"device": str(jax.devices()[0]), "iters": ITERS}
    for k in (64, 256, 512):
        for n in (500_000, 1_000_000):
            xla = _rate(k, n, False)
            pls = _rate(k, n, True)
            out[f"k{k}_n{n // 1000}k"] = {
                "xla_iters_per_sec": round(xla, 1),
                "pallas_iters_per_sec": round(pls, 1),
                "pallas_speedup": round(pls / xla, 3),
            }
            print(f"k={k} n={n}: xla={xla:.1f}/s pallas={pls:.1f}/s "
                  f"({pls / xla:.2f}x)", flush=True)
    path = os.path.join(os.path.dirname(__file__), "ICA_KERNEL_EVAL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
