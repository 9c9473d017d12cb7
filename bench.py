"""Benchmark driver: flagship RandomizedPca fit on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no benchmark numbers (BASELINE.md), so
``vs_baseline`` is the speedup of the TPU fit over the same Halko
pipeline run with numpy/BLAS on the host CPU — i.e. over a
reference-equivalent LAPACK implementation — normalized to the same
number of rows.

Config follows BASELINE eval config 2/4 scaled to one chip:
tall-skinny f32 data, k=32, oversampling 10, 2 power iterations,
CholeskyQR2 normalization (matmul-only pipeline; on one chip every op is
an MXU matmul, HBM-bandwidth bound at k+10=42 sketch columns).
"""

from __future__ import annotations

import json
import time

import numpy as np

N_ROWS = 1_000_000
N_COLS = 1024
K = 32
OVERSAMPLES = 10
POWER_ITERS = 2


def _tpu_fit_seconds() -> tuple[float, dict]:
    import jax
    import jax.numpy as jnp

    from petal_decomposition_tpu.parallel.distributed import (
        randomized_pca_fit,
    )
    from petal_decomposition_tpu.utils.rng import key_from_seed

    # Warm the Pallas kernel probe eagerly so the jitted pipeline can
    # dispatch the VMEM Jacobi kernel for the projected-matrix SVD.
    from petal_decomposition_tpu.ops.pallas.jacobi_kernels import (
        kernel_available,
    )

    kernel_available()

    dev = jax.devices()[0]
    key = key_from_seed(1_234_567_891_011_121_314)
    x = jax.device_put(
        jax.random.normal(jax.random.key(0), (N_ROWS, N_COLS), jnp.float32),
        dev,
    )
    x.block_until_ready()

    def run():
        st = randomized_pca_fit(
            x,
            key,
            n_components=K,
            centering=True,
            n_oversamples=OVERSAMPLES,
            n_power_iters=POWER_ITERS,
            normalizer="cholqr2",
        )
        # Materialize a small output on the host: block_until_ready alone
        # does not flush the remote-TPU execution queue in this stack.
        np.asarray(st["sigma"])
        return st

    st = run()  # warmup/compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    info = {
        "sigma_head": np.asarray(st["sigma"][:3]).tolist(),
        "device": str(dev),
    }
    return dt, info


def _cpu_baseline_seconds() -> float:
    """Same Halko pipeline in numpy/BLAS on the host at the REAL
    1M-row size (no extrapolation — round-1 review asked for the
    measured number)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((N_ROWS, N_COLS)).astype(np.float32)
    l = K + OVERSAMPLES

    def run_once() -> float:
        t0 = time.perf_counter()
        mu = x.mean(axis=0)
        xc = x - mu
        omega = rng.standard_normal((N_COLS, l)).astype(np.float32)
        q = xc @ omega
        for _ in range(POWER_ITERS):
            q, _ = np.linalg.qr(q)
            q = xc.T @ q
            q, _ = np.linalg.qr(q)
            q = xc @ q
        q, _ = np.linalg.qr(q)
        b = q.T @ xc
        u_b, s, vt = np.linalg.svd(b, full_matrices=False)
        _ = q @ u_b
        return time.perf_counter() - t0

    return run_once()


def _matmul_envelope() -> dict:
    """Raw ``jnp.dot`` ceilings on this allocation — the roofline the
    fit numbers are judged against (round-1 review: the
    'bandwidth-capped chip' argument must live in the artifacts)."""
    import jax
    import jax.numpy as jnp

    def timeit(f, *args, iters=3):
        float(jnp.sum(f(*args)))  # compile + settle
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*args)
        float(jnp.sum(r))  # the tunnel only flushes on a transfer
        return (time.perf_counter() - t0) / iters

    out = {}
    f = jax.jit(lambda a, b: jnp.dot(a, b, precision="highest"))
    # Skinny streaming gemm at the flagship shape: bandwidth-bound.
    a = jax.random.normal(jax.random.key(0), (N_ROWS, N_COLS), jnp.float32)
    b = jax.random.normal(jax.random.key(1), (N_COLS, K + OVERSAMPLES),
                          jnp.float32)
    dt = timeit(f, a, b)
    out["skinny_1Mx1024x42_f32"] = {
        "ms": round(dt * 1e3, 2),
        "gflops": round(2 * N_ROWS * N_COLS * (K + OVERSAMPLES) / dt / 1e9),
        "hbm_gbps": round(N_ROWS * N_COLS * 4 / dt / 1e9, 1),
    }
    # Square compute-bound gemm: the MXU ceiling.
    c = jax.random.normal(jax.random.key(2), (4096, 4096), jnp.float32)
    dt = timeit(f, c, c)
    out["square_4096_f32"] = {
        "ms": round(dt * 1e3, 2),
        "tflops": round(2 * 4096 ** 3 / dt / 1e12, 1),
    }
    return out


ICA_K = 64
ICA_N = 100_000
ICA_ITERS = 50


def _ica_cpu_baseline_iters_per_sec() -> float:
    """Host numpy/BLAS FastICA iteration rate at the same shape (the
    reference-equivalent single-threaded-library comparison point)."""
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal((ICA_K, ICA_N)).astype(np.float32)
    iters = 5

    def run_once() -> float:
        w = rng.standard_normal((ICA_K, ICA_K)).astype(np.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            wx = w @ x1
            g = np.tanh(wx)
            g_wtx = (1 - g * g).mean(axis=1)
            w1 = (g @ x1.T) / ICA_N - g_wtx[:, None] * w
            # symmetric decorrelation
            lam, e = np.linalg.eigh(w1 @ w1.T)
            w = (e / np.sqrt(np.maximum(lam, 1e-30))) @ e.T @ w1
        return time.perf_counter() - t0

    dt = float(np.median([run_once() for _ in range(3)]))
    return iters / dt


def _ica_iters_per_sec() -> float:
    """FastICA iteration throughput (BASELINE 'iters/sec' metric):
    timed on the jitted ica_par core at the eval-config-3 shape
    (64 sources × 100k samples, whitened f32)."""
    import jax
    import jax.numpy as jnp

    from petal_decomposition_tpu.models.fast_ica import _ica_par_core

    x1 = jax.random.normal(jax.random.key(1), (ICA_K, ICA_N), jnp.float32)
    w0 = jax.random.normal(jax.random.key(2), (ICA_K, ICA_K), jnp.float32)
    tol = jnp.asarray(1e-12, jnp.float32)  # force the full iteration count

    def run():
        w, _, _ = _ica_par_core(x1, tol, ICA_ITERS, w0, "logcosh")
        np.asarray(w).ravel()[:1]

    run()  # warmup
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    return ICA_ITERS / dt


def _ica_f64_mixed_iters_per_sec() -> float:
    """f64 FastICA iteration rate under the default
    ``iteration_precision="auto"`` (f32 iterate + f64 polish) — the
    round-2 answer to XLA's ~15× emulated-f64 matmul penalty."""
    import jax
    import jax.numpy as jnp

    from petal_decomposition_tpu.models.fast_ica import _ica_par_core

    x1 = jax.random.normal(jax.random.key(1), (ICA_K, ICA_N), jnp.float64)
    w0 = jax.random.normal(jax.random.key(2), (ICA_K, ICA_K), jnp.float64)
    tol = jnp.asarray(1e-30, jnp.float64)  # force the full iteration count

    def run():
        w, _, _ = _ica_par_core(
            x1, tol, ICA_ITERS, w0, "logcosh", precision="f32"
        )
        np.asarray(w).ravel()[:1]

    run()  # warmup
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    return ICA_ITERS / dt


def _extra_operating_points() -> dict:
    """Two more fit configs so the artifact carries the roofline sweep:
    a compute-heavy point (k=512 — arithmetic intensity ~261 flop/byte,
    past the MXU ridge) and the north-star feature width d=4096."""
    import jax
    import jax.numpy as jnp

    from petal_decomposition_tpu.parallel.distributed import (
        randomized_pca_fit,
    )
    from petal_decomposition_tpu.utils.rng import key_from_seed

    key = key_from_seed(1_234_567_891_011_121_314)

    def fit_time(n, d, k, iters=2):
        x = jax.random.normal(jax.random.key(3), (n, d), jnp.float32)

        def run():
            st = randomized_pca_fit(
                x, key, n_components=k, centering=True,
                n_oversamples=10, n_power_iters=iters,
                normalizer="cholqr2",
            )
            np.asarray(st["sigma"])

        run()
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        dt = float(np.min(times))
        l = k + 10
        passes = 2 + 2 * iters
        flops = passes * 2 * n * d * l
        return {
            "ms": round(dt * 1e3, 1),
            "intensity_flop_per_byte": round(l / 2, 1),
            "mxu_util_pct_vs_f32peak": round(
                flops / dt / 49e12 * 100, 1
            ),
            "hbm_gbps": round(passes * n * d * 4 / dt / 1e9, 1),
        }

    return {
        "compute_heavy_200kx2048_k512": fit_time(200_000, 2048, 512),
        "northstar_width_250kx4096_k32": fit_time(250_000, 4096, 32),
    }


def _retry(fn, attempts: int = 2):
    """Shield the recorded benchmark from transient remote-TPU hiccups."""
    last = None
    for _ in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — rethrown after retries
            last = e
    raise last


def main() -> None:
    tpu_s, info = _retry(_tpu_fit_seconds)
    cpu_s = _cpu_baseline_seconds()
    ica_ips = _retry(_ica_iters_per_sec)

    # Rough data-movement model for the fit: the sketch + 2×2 power-iter
    # passes + projection each stream the full matrix from HBM.
    passes = 2 + 2 * POWER_ITERS
    bytes_moved = passes * N_ROWS * N_COLS * 4
    hbm_gbps = bytes_moved / tpu_s / 1e9
    # Utilization readouts (SURVEY §5 tracing row).  At k+10=42 sketch
    # columns the algorithm's arithmetic intensity (~21 flop/byte) is far
    # below the MXU roofline (~240), so HBM utilization is the meaningful
    # axis; MXU% is reported for honesty.
    l = K + OVERSAMPLES
    flops = passes * 2 * N_ROWS * N_COLS * l
    mxu_util_pct = flops / tpu_s / 197e12 * 100  # vs bf16 peak
    hbm_util_pct = hbm_gbps / 819 * 100  # vs v5e HBM peak

    envelope = _retry(_matmul_envelope)
    extra = _retry(_extra_operating_points)

    result = {
        "metric": f"randomized_pca_fit_{N_ROWS // 1000}kx{N_COLS}_f32",
        "value": round(tpu_s * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(cpu_s / tpu_s, 2),
        "detail": {
            "cpu_baseline_measured_full_size_ms": round(cpu_s * 1e3, 1),
            "matmul_envelope": envelope,
            "operating_points": extra,
            "effective_hbm_gbps": round(hbm_gbps, 1),
            "hbm_util_pct": round(hbm_util_pct, 1),
            "mxu_util_pct": round(mxu_util_pct, 2),
            "k": K,
            "power_iters": POWER_ITERS,
            "fastica_iters_per_sec_64x100k": round(ica_ips, 1),
            "fastica_f64_mixed_iters_per_sec": round(
                _retry(_ica_f64_mixed_iters_per_sec), 1
            ),
            "fastica_cpu_baseline_iters_per_sec": round(
                _ica_cpu_baseline_iters_per_sec(), 1
            ),
            "device": info["device"],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
