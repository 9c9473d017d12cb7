"""The literal north-star config: RandomizedPca fit, 1M×4096 f32 k=32
(BASELINE.md:20), on ONE chip via the streamed Gram path — plus the
10M×4096 out-of-core capability shape (BASELINE configs[3] at 16× one
chip's HBM).

Why streamed: 1M×4096 f32 is 15.6 GiB — the whole of a v5e's HBM — so
no in-core fit can also hold the bf16 Gram copy.  `fit_batched`'s
accumulation touches one ~1 GiB block at a time, so the full shape runs
on one chip with the Gram contraction at d=4096 arithmetic intensity
d/2 = 2048 flop/byte: compute-bound, where ≥50% sustained MXU is
physically reachable (unlike the d=1024 flagship, which is HBM-bound —
DESIGN.md §7).

Two measurement modes per shape:

* **envelope** — blocks are generated ON DEVICE (`jax.random.normal`)
  and fed straight to the streamed accumulator step
  (`streaming._accum_step`, the exact program `fit_batched` runs).
  This measures the fit's compute pipeline at the real shape without
  conflating it with this environment's host→device tunnel (a remote
  TPU over a network relay; a PCIe-attached host feeds blocks at
  10-30 GB/s and lands at this envelope).  The device RNG's own cost
  is measured separately (RNG-only loop) and differenced out.
* **ingest** — the real `RandomizedPca(32).fit_batched(x)` over a host
  RAM buffer, end-to-end: wall clock, ingest GB/s, and σ agreement
  between the bf16 (`gram_precision="default"`) and f32-`highest`
  accumulations on identical data — the measured accuracy cost of the
  MXU-saturating mode.

Prints one JSON document; writes benchmarks/NORTH_STAR.json.
Run:  python benchmarks/north_star.py [--modes envelope,ingest,10m]
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
import argparse
import functools
import json
import os
import time

import petal_decomposition_tpu  # noqa: F401  (x64 + platform config first)
import numpy as np
import jax
import jax.numpy as jnp

from petal_decomposition_tpu.models import streaming
from petal_decomposition_tpu.utils.rng import key_from_seed

HERE = os.path.dirname(os.path.abspath(__file__))
SEED = 1_234_567_891_011_121_314

D = 4096
K = 32
BLOCK = 65536
N_BLOCKS_1M = 16  # 16 x 65536 = 1,048,576 rows
N_BLOCKS_10M = 160

V5E_BF16_PEAK = 197e12  # the round-3 single denominator (bench.py)


def _gen_block(i: int):
    return jax.random.normal(
        jax.random.fold_in(jax.random.key(0), i), (BLOCK, D), jnp.float32
    )


def _flush(x) -> None:
    """Force execution with a tiny device→host fetch: on the axon
    tunnel stack ``block_until_ready`` returns before remote execution
    finishes (see benchmarks/roofline.py), so a data read of the LAST
    op in the queue is the only honest sync (the device executes in
    dispatch order, so one element of the final result drains all of
    it)."""
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def _rng_only_s(n_blocks: int) -> float:
    """Wall for generating the blocks alone (subtracted from the
    envelope: fit_batched's real input arrives via DMA, not the VPU)."""
    for rep in range(2):
        t0 = time.perf_counter()
        out = None
        for i in range(n_blocks):
            out = _gen_block(i)
        _flush(out)
        dt = time.perf_counter() - t0
    return dt


def _gram_carry_dtype(precision: str):
    """Mirror of _accumulate_chunks' carry choice: f32 Gram carry for
    the explicit bf16 grade on accelerators, f64 otherwise."""
    from petal_decomposition_tpu.ops.linalg import effective_platform

    return (
        jnp.float32
        if precision == "default" and effective_platform() != "cpu"
        else jnp.float64
    )


def _envelope(n_blocks: int, precision: str) -> dict:
    """Streamed-accumulation compute envelope with device-side blocks.

    Runs the exact `_accum_step` program of fit_batched; returns wall
    times and the solved σ so precisions can be compared on identical
    data."""
    n = n_blocks * BLOCK
    shift = jnp.zeros((D,), jnp.float64)  # exercised via centering math
    accum = functools.partial(streaming._accum_step, precision=precision)
    g_dtype = _gram_carry_dtype(precision)

    def run():
        carry = (
            jnp.zeros((D, D), g_dtype),
            jnp.zeros((D,), jnp.float64),
            jnp.zeros((), jnp.float64),
        )
        for i in range(n_blocks):
            carry = accum(carry, _gen_block(i), shift, BLOCK)
        _flush(carry[0])
        return carry

    carry = run()  # compile + warm
    t0 = time.perf_counter()
    carry = run()
    wall = time.perf_counter() - t0

    means, gc, tv, r = streaming._finalize_centered(
        *carry, shift, float(n)
    )
    m = streaming.StreamMoments(
        means.astype(jnp.float32), gc, tv, r,
        n_samples=n, n_blocks=n_blocks, dtype=jnp.dtype(jnp.float32),
    )
    t0 = time.perf_counter()
    sigma, vt, off = streaming.randomized_pca_from_gram(
        m, key_from_seed(SEED), n_components=K, n_oversamples=10,
        n_power_iters=7,
    )
    sigma = np.asarray(sigma)
    solve_s = time.perf_counter() - t0
    gram_flops = 2.0 * n * D * D
    return {
        "rows": n,
        "precision": precision,
        "accum_wall_s": round(wall, 3),
        "solve_wall_s_first_call": round(solve_s, 3),
        "sigma_top4": [float(s) for s in sigma[:4]],
        "mxu_pct_raw": round(gram_flops / wall / V5E_BF16_PEAK * 100, 1),
        "sigma": sigma,
    }


@functools.partial(
    jax.jit, static_argnames=("iters", "precision", "read_only")
)
def _device_loop(x2, shift, *, iters, precision, read_only):
    """The whole streamed accumulation as ONE dispatch: a fori_loop
    feeds HBM-resident blocks (rotating halves of ``x2`` — exactly a
    block's situation after ``fit_batched``'s H2D copy lands) through
    the exact ``_accum_step`` program.  ``read_only=True`` touches each
    block without computing (one row consumed so nothing is
    dead-code-eliminated) — its wall is the differencing term."""
    carry0 = (
        jnp.zeros((D, D), _gram_carry_dtype(precision)),
        jnp.zeros((D,), jnp.float64),
        jnp.zeros((), jnp.float64),
    )

    def body(i, carry):
        g, s, sq = carry
        blk = jax.lax.dynamic_slice(x2, ((i % 2) * BLOCK, 0), (BLOCK, D))
        if read_only:
            # Consume a full-block reduction (f32 accumulation — an
            # emulated-f64 reduction would add ~10 ms/block of its own,
            # see the moment-dtype ablation) so XLA cannot narrow the
            # dynamic_slice to one row and skip the HBM read this term
            # exists to measure.
            return g, s, sq + jnp.sum(blk, dtype=jnp.float32).astype(
                jnp.float64
            )
        return streaming._accum_step(
            (g, s, sq), blk, shift, BLOCK, precision=precision
        )

    return jax.lax.fori_loop(0, iters, body, carry0)


def _device_envelope(n_blocks: int, precision: str) -> dict:
    """Device-resident pipeline rate: removes the tunnel's ~30 ms/block
    host dispatch tax that the per-block envelope pays (through a
    PCIe-attached host the dispatch is ~µs, so THIS number is the
    sustained ceiling of the streamed accumulation program itself;
    H2D transport is reported separately by ingest mode /
    stream_oocore.py)."""
    shift = jnp.zeros((D,), jnp.float64)
    n = n_blocks * BLOCK
    x2 = jnp.concatenate([_gen_block(0), _gen_block(1)], axis=0)
    _flush(x2)
    walls = {}
    sigma_top4 = None
    for mode in (True, False):
        def run():
            c = _device_loop(
                x2, shift, iters=n_blocks, precision=precision,
                read_only=mode,
            )
            _flush(c[0])
            return c

        carry = run()  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            carry = run()
            ts.append(time.perf_counter() - t0)
        walls[mode] = float(np.min(ts))
        if not mode:
            means, gc, tv, r = streaming._finalize_centered(
                *carry, shift, float(n)
            )
            m = streaming.StreamMoments(
                means.astype(jnp.float32), gc, tv, r, n_samples=n,
                n_blocks=n_blocks, dtype=jnp.dtype(jnp.float32),
            )
            sigma, _, _ = streaming.randomized_pca_from_gram(
                m, key_from_seed(SEED), n_components=K,
                n_oversamples=10, n_power_iters=7,
            )
            sigma_top4 = [float(s) for s in np.asarray(sigma)[:4]]
    gram_flops = 2.0 * n * D * D
    accum_s, read_s = walls[False], walls[True]
    return {
        "accum_wall_s": round(accum_s, 3),
        "read_only_wall_s": round(read_s, 3),
        "ms_per_block": round(accum_s / n_blocks * 1e3, 1),
        "sigma_top4": sigma_top4,
        "sigma_note": (
            "the device loop rotates TWO blocks n_blocks/2 times each "
            "(HBM-residency stand-in), so its sigma is NOT comparable "
            "to the envelope's true-data sigma — expect ~10% offset"
        ),
        "mxu_pct_raw": round(
            gram_flops / accum_s / V5E_BF16_PEAK * 100, 1
        ),
    }


def run_envelope(n_blocks: int) -> dict:
    rng_s = _rng_only_s(n_blocks)
    e_def = _envelope(n_blocks, "default")
    out = {
        "rng_only_wall_s": round(rng_s, 3),
        "default": e_def,
        "device_loop_default": _device_envelope(n_blocks, "default"),
    }
    gram_flops = 2.0 * (n_blocks * BLOCK) * D * D
    out["default"]["mxu_pct_rng_differenced"] = round(
        gram_flops / max(e_def["accum_wall_s"] - rng_s, 1e-9)
        / V5E_BF16_PEAK * 100, 1,
    )
    if n_blocks <= N_BLOCKS_1M:  # high/highest are slower; 1M only
        e_high = _envelope(n_blocks, "high")  # the streamed f32 "auto"
        e_hi = _envelope(n_blocks, "highest")
        out["high"] = e_high
        out["highest"] = e_hi
        s_d = out["default"].pop("sigma")
        s_3, s_h = e_high.pop("sigma"), e_hi.pop("sigma")
        out["sigma_rel_diff_default_vs_highest"] = float(
            np.max(np.abs(s_d - s_h) / s_h)
        )
        out["sigma_rel_diff_high_vs_highest"] = float(
            np.max(np.abs(s_3 - s_h) / s_h)
        )
    else:
        out["default"].pop("sigma")
    for v in out.values():
        if isinstance(v, dict):
            v.pop("sigma", None)
    return out


def run_ingest(n_blocks: int) -> dict:
    """End-to-end fit_batched from host RAM through this environment's
    transport, both gram precisions on identical data."""
    from petal_decomposition_tpu import RandomizedPca

    n = n_blocks * BLOCK
    nbytes = n * D * 4
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, D), dtype=np.float32)

    out = {"rows": n, "gigabytes": round(nbytes / 1e9, 1)}
    sigmas = {}
    # Explicit grades: "auto" resolves to "high" for f32 streams on
    # accelerators since round 5 (benchmarks/GRAM_GRADE.json decision),
    # so the reference grade for the sigma diff is named explicitly.
    for precision in ("default", "highest"):
        m = RandomizedPca(K, seed=SEED, gram_precision=precision)
        m.fit_batched(x, block_rows=BLOCK)  # compile + measure in one:
        t0 = time.perf_counter()           # re-fit on the warm cache
        m.fit_batched(x, block_rows=BLOCK)
        wall = time.perf_counter() - t0
        sigmas[precision] = np.asarray(m.singular_values_)
        out[f"fit_wall_s_{precision}"] = round(wall, 3)
        out[f"ingest_gbps_{precision}"] = round(nbytes / wall / 1e9, 2)
        out[f"mxu_pct_{precision}"] = round(
            2.0 * n * D * D / wall / V5E_BF16_PEAK * 100, 1
        )
    out["sigma_rel_diff_default_vs_highest"] = float(
        np.max(np.abs(sigmas["default"] - sigmas["highest"]) / sigmas["highest"])
    )
    out["sigma_top4"] = [float(s) for s in sigmas["highest"][:4]]
    del x
    return out


def main() -> None:
    global D, BLOCK, N_BLOCKS_1M, N_BLOCKS_10M
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="envelope,ingest,10m")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes: validates the harness on CPU")
    args = ap.parse_args()
    modes = set(args.modes.split(","))
    if args.smoke:
        D, BLOCK, N_BLOCKS_1M, N_BLOCKS_10M = 64, 2048, 3, 6

    result = {
        "config": f"RandomizedPca k={K}, d={D}, f32, streamed Gram path",
        "device": str(jax.devices()[0]),
        "denominator_tflops_bf16": V5E_BF16_PEAK / 1e12,
    }
    if "envelope" in modes:
        result["envelope_1m"] = run_envelope(N_BLOCKS_1M)
    if "10m" in modes:
        result["envelope_10m"] = run_envelope(N_BLOCKS_10M)
    if "ingest" in modes:
        result["ingest_1m"] = run_ingest(N_BLOCKS_1M)

    with open(os.path.join(HERE, "NORTH_STAR.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
