"""Measure the FastICA ds64 polish stage vs emulated-f64 (VERDICT r4
task 5): per-gemm split-product walls + errors, per-stage iteration
throughput at the bench shape (k=64, n=100k), the ds64 iteration's
convergence stall point (justifying ``fast_ica._DS64_LIM_FLOOR``), and
the end-to-end mixed pipeline on a converging k=64 mixture.

Run on the TPU (one tunnel job at a time):

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/ds64_stage.py

Writes ``benchmarks/DS64_STAGE.json``.
"""
import functools
import json
import pathlib
import time

import petal_decomposition_tpu  # noqa: F401  (x64 on at import)
import numpy as np
import jax
import jax.numpy as jnp

from petal_decomposition_tpu.models.fast_ica import (
    _contrast_sums,
    _ica_par_core,
    symmetric_decorrelation,
)
from petal_decomposition_tpu.ops import splitmm
from petal_decomposition_tpu.ops.linalg import mdot

K, N = 64, 100_000


def _flush(x):
    # Honest tunnel sync: device_get of one element (block_until_ready
    # returns at the remote completion signal, before results land).
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(jnp.ravel(leaves[0])[:1]))


def timed_ms(f, *a, reps=10):
    _flush(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    _flush(r)
    return (time.perf_counter() - t0) / reps * 1e3


def normwise(a, ref):
    a, ref = np.asarray(a), np.asarray(ref)
    return float(np.max(np.abs(a - ref)) / np.max(np.abs(ref)))


# ---- loop bodies, mirroring _ica_par_core's three stages ------------


def _body_f64(x, w):
    g, gsum = _contrast_sums("logcosh", mdot(w, x))
    gx = mdot(g, x.T)
    update = gx / N - (gsum / N)[:, None] * w
    w1 = symmetric_decorrelation(update)
    lim = jnp.max(jnp.abs(jnp.abs(jnp.einsum("ij,ji->i", w1, w)) - 1.0))
    return w1, lim


def _body_ds64(xh, xl, w):
    wx32 = splitmm.mm_split_f32(w, xh, xl)
    g, gsum = _contrast_sums("logcosh", wx32, sum_dtype=jnp.float64)
    gx = splitmm.mm_split_chunked_f64(g, xh, xl)
    update = gx / N - (gsum / N)[:, None] * w
    w1 = symmetric_decorrelation(update)
    lim = jnp.max(jnp.abs(jnp.abs(jnp.einsum("ij,ji->i", w1, w)) - 1.0))
    return w1, lim


def _body_f32(x32, w):
    g, gsum = _contrast_sums("logcosh", mdot(w, x32))
    gx = mdot(g, x32.T)
    update = gx / np.float32(N) - (gsum / np.float32(N))[:, None] * w
    w1 = symmetric_decorrelation(update)
    lim = jnp.max(jnp.abs(jnp.abs(jnp.einsum("ij,ji->i", w1, w)) - 1.0))
    return w1, lim


@functools.partial(jax.jit, static_argnames=("iters",))
def loop_f64(x, w, iters: int):
    def step(_, carry):
        w, _ = carry
        return _body_f64(x, w)

    return jax.lax.fori_loop(0, iters, step, (w, jnp.inf))


@functools.partial(jax.jit, static_argnames=("iters",))
def loop_ds64(x, w, iters: int):
    xh, xl = splitmm.split_f64(x)

    def step(_, carry):
        w, _, min_lim = carry
        w1, lim = _body_ds64(xh, xl, w)
        return w1, lim, jnp.minimum(min_lim, lim)

    return jax.lax.fori_loop(0, iters, step, (w, jnp.inf, jnp.inf))


@functools.partial(jax.jit, static_argnames=("iters",))
def loop_f32(x32, w32, iters: int):
    def step(_, carry):
        w, _ = carry
        return _body_f32(x32, w)

    f32inf = jnp.asarray(jnp.inf, jnp.float32)
    return jax.lax.fori_loop(0, iters, step, (w32, f32inf))


def main():
    # Pallas compile probes must run eagerly before any tracing or the
    # jitted loops bake in the slow XLA f64 eigh route (the eager
    # symmetric_decorrelation below also warms it; be explicit).
    from petal_decomposition_tpu.ops.jacobi import warm_kernel_probes

    warm_kernel_probes(jnp.float32)
    warm_kernel_probes(jnp.float64)

    out = {"device": str(jax.devices()[0]), "shape": [K, N]}
    key = jax.random.key(1)
    x = jax.random.normal(key, (K, N), jnp.float64)
    w = jax.random.normal(jax.random.fold_in(key, 1), (K, K), jnp.float64)
    w = symmetric_decorrelation(w)
    # The real ds64-stage left operand is the f32-evaluated contrast;
    # the f64 baseline gemm (what the true-f64 stage pays) uses f64 g.
    g64 = jnp.tanh(mdot(w, x))
    g = g64.astype(jnp.float32)
    xh, xl = splitmm.split_f64(x)

    # -- per-gemm walls + errors --------------------------------------
    g1_f64 = jax.jit(lambda w, x: mdot(w, x))
    g2_f64 = jax.jit(lambda g, x: mdot(g, x.T))
    g1_split = jax.jit(splitmm.mm_split_f32)
    g2_split = jax.jit(splitmm.mm_split_chunked_f64)
    r1 = g1_f64(w, x)
    # Error reference: the exact product of the split gemm's own
    # operands (f32 g at f64 carry) — isolates accumulation error.
    r2 = g2_f64(g.astype(jnp.float64), x)
    out["gemm1"] = {
        "contraction": K,
        "f64_ms": round(timed_ms(g1_f64, w, x), 3),
        "split_ms": round(timed_ms(g1_split, w, xh, xl), 3),
        "split_normwise_err": normwise(g1_split(w, xh, xl), r1),
    }
    out["gemm2"] = {
        "contraction": N,
        "chunk": 512,
        "f64_ms": round(timed_ms(g2_f64, g64, x), 3),
        "split_ms": round(timed_ms(g2_split, g, xh, xl), 3),
        "split_normwise_err": normwise(g2_split(g, xh, xl), r2),
    }
    print("gemm1:", out["gemm1"], flush=True)
    print("gemm2:", out["gemm2"], flush=True)

    # -- per-stage iteration throughput -------------------------------
    def it_per_s(fn, *a, iters, reps=3):
        _flush(fn(*a, iters=iters))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*a, iters=iters)
        _flush(r)
        return iters * reps / (time.perf_counter() - t0)

    stages = {
        "f32": it_per_s(loop_f32, x.astype(jnp.float32),
                        w.astype(jnp.float32), iters=200),
        "ds64": it_per_s(loop_ds64, x, w, iters=100),
        "f64": it_per_s(loop_f64, x, w, iters=25),
    }
    out["stage_iters_per_s"] = {k: round(v, 1) for k, v in stages.items()}
    out["ds64_vs_f64_speedup"] = round(stages["ds64"] / stages["f64"], 2)
    print("stages it/s:", out["stage_iters_per_s"],
          "speedup:", out["ds64_vs_f64_speedup"], flush=True)

    # -- one-step update noise at the bench shape ----------------------
    # The quantity each stage's floor constant must dominate is the
    # per-step arithmetic error of that stage's body relative to the
    # f64 body, evaluated at a near-fixed-point W.  Fixture: the true
    # unmixing matrix is a symmetric orthogonal R (E·diag(±1)·Eᵀ) and
    # X = R·S with unit-variance Laplace sources — W* ≈ R, which the
    # reference convergence functional (diag(W1·W), rows-of-new ×
    # cols-of-old, ica.rs:344-354) can actually drive down: it reaches
    # 0 only at a SYMMETRIC fixed point.  Even here the lim stalls at
    # the empirical fixed point's symmetry defect, O(n^-1/2) sampling
    # noise (~1e-3 at n=100k, identical at f64/ds64/f32) — evidence
    # that large-k fits cap at max_iter at ANY precision, exactly as
    # the reference does on generic data.  The floor constants are
    # therefore justified by one-step noise, not by an achievable lim.
    rng = np.random.default_rng(7)
    s = rng.laplace(size=(K, N)) / np.sqrt(2.0)
    evecs, _ = np.linalg.qr(rng.standard_normal((K, K)))
    r_sym = (evecs * rng.choice([-1.0, 1.0], size=K)[None, :]) @ evecs.T
    xw = jnp.asarray(r_sym @ s)
    w0 = symmetric_decorrelation(
        jnp.asarray(r_sym + 1e-2 * rng.standard_normal((K, K)))
    )
    wf, lim_at_wf = loop_f64(xw, w0, iters=40)

    xh_w, xl_w = splitmm.split_f64(xw)
    w1_64, lim_64 = jax.jit(_body_f64)(xw, wf)
    w1_ds, lim_ds = jax.jit(_body_ds64)(xh_w, xl_w, wf)
    w1_32, lim_32 = jax.jit(_body_f32)(
        xw.astype(jnp.float32), wf.astype(jnp.float32)
    )
    out["one_step_update_noise"] = {
        "fixture": "X = R·S, R symmetric orthogonal, 64 Laplace "
                   "sources, n=100k; W at the 40-f64-step iterate",
        "lim_sampling_floor": float(lim_at_wf),
        "ds64_dw": float(jnp.max(jnp.abs(w1_ds - w1_64))),
        "ds64_dlim": float(jnp.abs(lim_ds - lim_64)),
        "f32_dw": float(
            jnp.max(jnp.abs(w1_32.astype(jnp.float64) - w1_64))
        ),
        "f32_dlim": float(
            jnp.abs(lim_32.astype(jnp.float64) - lim_64)
        ),
        "ds64_floor_constant": 2e-6,
        "f32_floor_constant": 1e-5,
    }
    print("one-step noise:", out["one_step_update_noise"], flush=True)

    # -- stage floors + pipeline on a genuinely converging fixture ----
    # The reference's two-source family (ica.rs:446-456) at n=100k:
    # lims genuinely reach the arithmetic floor here, so each stage
    # body's achieved lim IS its stall, and the mixed pipeline
    # exercises all three stages (f32 → ds64 → f64 certification).
    t = np.arange(N)
    src2 = np.stack(
        [np.sin(t * 0.01), np.sign(np.sin(t * 0.037 + 0.4))], axis=0
    )
    mix2 = np.array([[1.0, 0.6], [0.4, 1.0]]) @ src2
    xc2 = mix2 - mix2.mean(axis=1, keepdims=True)
    u2, s2, _ = np.linalg.svd(xc2, full_matrices=False)
    x2 = jnp.asarray((u2 / s2).T @ xc2 * np.sqrt(N))
    w02 = symmetric_decorrelation(
        jax.random.normal(jax.random.fold_in(key, 3), (2, 2), jnp.float64)
    )
    wf2_raw, _ = loop_f64(x2, w02, iters=30)
    # The iterate may land on a ROTATION fixed point ([[c,-s],[s,c]]),
    # where the reference lim functional stalls at |c²−s²| even though
    # the map has converged.  Flipping one row maps it to the
    # REFLECTION fixed point of the same empirical iteration (odd
    # contrast ⇒ D·W* is a fixed point whenever W* is), which is
    # exactly symmetric — there the lim measures pure arithmetic
    # stall.  Pick the row-sign variant with the smallest one-step lim.
    variants = [jnp.diag(jnp.asarray(d, jnp.float64)) @ wf2_raw
                for d in ([1.0, 1.0], [-1.0, 1.0], [1.0, -1.0])]
    step_lims = [float(jax.jit(_body_f64)(x2, v)[1]) for v in variants]
    wf2 = variants[int(np.argmin(step_lims))]
    _, lim2_64 = loop_f64(x2, wf2, iters=10)
    _, last2_ds, min2_ds = loop_ds64(x2, wf2, iters=20)
    _, lim2_32 = loop_f32(
        x2.astype(jnp.float32), wf2.astype(jnp.float32), iters=20
    )
    out["two_source_stage_floors"] = {
        "f64_lim": float(lim2_64),
        "ds64_min_lim": float(min2_ds),
        "f32_lim": float(lim2_32),
    }
    print("two-source floors:", out["two_source_stage_floors"],
          flush=True)

    # Pipeline init in the reflection fixed point's basin (a generic
    # init may converge to the rotation variant, where the reference
    # lim never falls — the bench's cap path, already covered there).
    w0p = symmetric_decorrelation(
        wf2 + 0.05 * jax.random.normal(
            jax.random.fold_in(key, 4), (2, 2), jnp.float64
        )
    )
    for prec in ("full", "f32"):
        def run_pipe():
            w_fit, lim, n_it = _ica_par_core(
                x2, jnp.asarray(1e-9, jnp.float64), 200, w0p, "logcosh",
                decorrelation="eigh", precision=prec)
            _flush(w_fit)
            return float(lim), int(n_it)

        run_pipe()  # compile
        t0 = time.perf_counter()
        lim_v, n_it = run_pipe()
        wall = time.perf_counter() - t0
        out[f"pipeline_two_source_{prec}"] = {
            "tol": 1e-9,
            "n_iter": n_it,
            "lim": lim_v,
            "converged": n_it < 200,
            "wall_s": round(wall, 4),
        }
        print(f"pipeline {prec}:", out[f"pipeline_two_source_{prec}"],
              flush=True)

    path = pathlib.Path(__file__).parent / "DS64_STAGE.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
