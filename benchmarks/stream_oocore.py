"""Out-of-core streamed-fit probe on the real chip.

Measures `RandomizedPca.fit_batched` on a dataset that can exceed chip
HBM (v5e: 16 GB): the host generates row blocks on the fly (never
holding the full matrix either), so both the device and host memory
stay flat while n grows without bound.

Contract: end-to-end wall clock, effective stream bandwidth (dataset
bytes / wall), device-side accumulate throughput, and σ parity vs an
in-core gram-finder fit when the dataset also fits in HBM (above that,
a subsample sanity value only).  Through the axon tunnel the H2D
copy is the expected bottleneck (the tunnel is a network link, not
PCIe); the probe reports the H2D-only envelope alongside so the two
are never conflated.

Run (one TPU job at a time through the tunnel!):
    python -u benchmarks/stream_oocore.py [n_rows_millions]
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
import json
import sys
import time

import numpy as np

import petal_decomposition_tpu  # noqa: F401  (x64 + platform config)
import jax

from petal_decomposition_tpu import RandomizedPca

D = 1024
K = 32
BLOCK = 262_144  # 1 GB f32 blocks at d=1024
SEED = 1_234_567_891_011_121_314


def gen_blocks(n_rows: int, *, record_shadow=None):
    """Deterministic per-block Gaussian data with a planted spectrum;
    optionally records every 64th row into a host-side shadow matrix
    for the parity check."""
    scales = np.linspace(3.0, 1.0, D).astype(np.float32)
    done = 0
    i = 0
    while done < n_rows:
        rows = min(BLOCK, n_rows - done)
        rng = np.random.default_rng(1000 + i)
        b = rng.standard_normal((rows, D), dtype=np.float32)
        b *= scales
        b += 2.5
        if record_shadow is not None:
            record_shadow.append(b[::64].copy())
        yield b
        done += rows
        i += 1


def _flush(x) -> None:
    # Data fetch of the queue's last op: on the tunnel stack
    # block_until_ready returns before remote execution completes
    # (benchmarks/roofline.py), so only a read is an honest sync.
    np.asarray(jax.device_get(jax.numpy.ravel(x)[:1]))


def h2d_envelope() -> float:
    """GB/s of ONE bare block transfer, each flushed before the next —
    the per-transfer definition (what a single serial put costs), not
    pipelined throughput.  The streamed fit itself runs ≥2 transfers in
    flight (``streaming._device_prefetch``), so its stream rate may
    legitimately exceed this figure."""
    b = np.ones((BLOCK, D), np.float32)
    _flush(jax.device_put(b))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _flush(jax.device_put(b))
        ts.append(time.perf_counter() - t0)
    return b.nbytes / float(np.min(ts)) / 1e9


def main() -> None:
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    n_rows = int(n_m * 1e6)
    total_gb = n_rows * D * 4 / 1e9
    print(f"stream: {n_rows}x{D} f32 = {total_gb:.1f} GB "
          f"(v5e HBM is 16 GB)", flush=True)

    h2d = h2d_envelope()
    print(f"h2d envelope: {h2d:.2f} GB/s", flush=True)

    # Warm the step/solve compiles on one small stream so the timed run
    # measures steady-state streaming, not compilation.
    warm = RandomizedPca(K, seed=SEED)
    warm.fit_batched(gen_blocks(BLOCK), block_rows=BLOCK)
    print("warm fit done", flush=True)

    # Parity strategy: when the dataset also fits in HBM (≤ 6 GB
    # leaves room for the in-core fit's working set), materialize it
    # once and compare streamed σ against the in-core fit directly.
    # Above that, only a 1/64 row-subsample sanity value is possible —
    # note it is biased up by Marchenko–Pastur noise (measured ~20% on
    # a ramp spectrum at 1/64), a sanity check, NOT a parity metric.
    in_core_ok = total_gb <= 6.0
    shadow: list[np.ndarray] = []
    if in_core_ok:
        x_full = np.concatenate(list(gen_blocks(n_rows)))
        stream_src = lambda: x_full  # array input streams via slices
    else:
        stream_src = lambda: gen_blocks(n_rows, record_shadow=shadow)

    model = RandomizedPca(K, seed=SEED)
    t0 = time.perf_counter()
    model.fit_batched(stream_src(), block_rows=BLOCK)
    wall = time.perf_counter() - t0
    sig = np.asarray(model.singular_values_)
    stats = model.last_fit_stats_

    out = {
        "n_rows": n_rows,
        "d": D,
        "dataset_gb": round(total_gb, 1),
        "blocks": stats.extra["streamed_blocks"],
        "wall_s": round(wall, 2),
        "stream_gbps": round(total_gb / wall, 2),
        "h2d_envelope_gbps": round(h2d, 2),
        "pct_of_h2d_envelope": round(total_gb / wall / h2d * 100, 1),
        "sigma_head": [round(float(s), 2) for s in sig[:4]],
        "mean_shift_ratio": stats.extra["mean_shift_ratio"],
        "device": str(jax.devices()[0]),
    }
    if in_core_ok:
        ic = RandomizedPca(K, seed=SEED, range_finder="gram").fit(x_full)
        sig_ic = np.asarray(ic.singular_values_)
        out["sigma_rel_vs_in_core"] = round(
            float(np.max(np.abs(sig - sig_ic) / sig_ic)), 5
        )
    else:
        xs = np.concatenate(shadow)
        shadow_fit = RandomizedPca(K, seed=SEED, range_finder="gram").fit(xs)
        sig_shadow = np.asarray(shadow_fit.singular_values_) * np.sqrt(
            n_rows / xs.shape[0]
        )
        out["sigma_rel_vs_subsampled_shadow_sanity_only"] = round(
            float(np.max(np.abs(sig - sig_shadow) / sig)), 3
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
