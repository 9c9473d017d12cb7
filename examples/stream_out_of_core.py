"""Out-of-core fits: decompose data that never fits in device memory.

Demonstrates the full streamed surface on a disk-backed matrix:

* ``Pca.fit_batched`` / ``RandomizedPca.fit_batched`` — one pass over
  an ``np.memmap`` accumulates the d×d Gram + moments on device; the
  fittable row count is unbounded by HBM or host RAM.
* ``partial_fit`` — sklearn-``IncrementalPCA`` semantics: the model is
  consistently fitted after every call.
* ``FastIca.fit_batched`` — two streamed passes (whitening moments,
  then the whitened k×n fill); the unchanged in-core iteration
  finishes on device.
* ``transform_batched`` — block-wise projection back out.

Run:  python examples/stream_out_of_core.py  (CPU-sized; scale N up on
a chip — the code path is identical).
"""

import os
import tempfile

import numpy as np

from petal_decomposition_tpu import FastIca, Pca, RandomizedPca

N, D, K = 200_000, 64, 8
rng = np.random.default_rng(0)

with tempfile.TemporaryDirectory() as td:
    # A disk-backed matrix, written block-by-block (never fully in RAM).
    path = os.path.join(td, "giant.f32")
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(N, D))
    t = np.linspace(0, 60, N)
    sources = np.stack(
        [np.sin(2.0 * t), np.sign(np.sin(3.1 * t)), rng.laplace(size=N)],
        axis=1,
    ).astype(np.float32)
    mixing = rng.standard_normal((3, D)).astype(np.float32)
    for i in range(0, N, 20_000):
        block = sources[i : i + 20_000] @ mixing
        block += 0.05 * rng.standard_normal(block.shape).astype(np.float32)
        mm[i : i + 20_000] = block + 2.0  # offset: exercises centering
    mm.flush()
    x = np.memmap(path, dtype=np.float32, mode="r", shape=(N, D))

    # --- streamed exact PCA -------------------------------------------
    pca = Pca(K).fit_batched(x, block_rows=32_768)
    evr = np.asarray(pca.explained_variance_ratio())
    print(f"Pca.fit_batched: top-{K} explain {evr.sum():.3f} of variance "
          f"(3 mixed sources -> {evr[:3].sum():.3f} in the first 3)")

    # --- streamed randomized PCA --------------------------------------
    rpca = RandomizedPca(K, seed=42).fit_batched(x, block_rows=32_768)
    print("RandomizedPca.fit_batched sigma[:3]:",
          np.round(np.asarray(rpca.singular_values_)[:3], 1))

    # --- incremental: partial_fit --------------------------------------
    inc = Pca(K)
    for i in range(0, N, 50_000):
        inc.partial_fit(x[i : i + 50_000])
    # Compare the source components (the trailing sigmas sit at the 5%
    # noise floor, where f32 relative error is meaningless).
    sig_full = np.asarray(pca.singular_values_)[:3]
    sig_inc = np.asarray(inc.singular_values_)[:3]
    print("partial_fit == fit_batched (top-3 sigma):",
          bool(np.allclose(sig_inc, sig_full, rtol=1e-4)))

    # --- streamed FastICA ----------------------------------------------
    ica = FastIca(seed=7, n_components=3).fit_batched(x, block_rows=32_768)
    rec = ica.transform_batched(x, block_rows=32_768)
    corr = np.corrcoef(rec[:, :3].T, sources.T)[:3, 3:]
    print("FastIca.fit_batched source recovery |corr| per source:",
          np.round(np.abs(corr).max(axis=1), 3))
    del x, mm
