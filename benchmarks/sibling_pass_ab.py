"""Valid A/B of moving the mu/tv sibling reductions between passes.

Four measurements at the flagship point (1M x 1024 f32, l=42), each with
`xe = x + s` so the matmul itself depends on the loop carry (no hoisting):

  A gram + mu + tv siblings     (current _gram_moments pass)
  B gram only
  C sketch only (centered, precomputed mu)
  D sketch + mu + tv siblings + ones column (proposed V2 pass)

V2 wins iff (A - B) > (D - C).
"""
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
import petal_decomposition_tpu  # noqa: F401
from petal_decomposition_tpu.ops.linalg import mdot
import jax, jax.numpy as jnp, numpy as np, time, functools, json

N, D, L = 1_000_000, 1024, 42
x = jax.random.normal(jax.random.key(1), (N, D), jnp.float32)
w0 = jax.random.normal(jax.random.key(2), (D, L), jnp.float32)
jax.block_until_ready((x, w0))
mu0 = jnp.sum(x, axis=0) / N
jax.block_until_ready(mu0)


def _flush(r):
    np.asarray(jax.device_get(jnp.ravel(r)[:1]))


def timed(fn, *args, reps=3):
    r = fn(*args); _flush(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); _flush(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def diff(body, args, iters=4):
    @functools.partial(jax.jit, static_argnames=("k",))
    def run(*args, k):
        return jax.lax.fori_loop(
            0, k, lambda i, s: body(s, *args), jnp.float32(0)
        )
    t1 = timed(functools.partial(run, k=iters), *args)
    t2 = timed(functools.partial(run, k=2 * iters), *args)
    return max(t2 - t1, 1e-9) / iters


def a_body(s, x):
    xe = x + s
    g = jnp.dot(xe.T, xe, precision="default")
    mu = jnp.sum(xe, axis=0)
    tv = jnp.sum(xe * xe)
    return (jnp.sum(jnp.abs(g)) + jnp.sum(jnp.abs(mu)) + tv) * 1e-30


def b_body(s, x):
    xe = x + s
    g = jnp.dot(xe.T, xe, precision="default")
    return jnp.sum(jnp.abs(g)) * 1e-30


def c_body(s, x, w, mu):
    xe = x + s
    y = mdot(xe, w) - jnp.outer(jnp.ones((N,), x.dtype), mu @ w)
    return jnp.max(jnp.abs(y)) * 1e-30


def d_body(s, x, w):
    xe = x + s
    y_raw = mdot(xe, w)
    mu = jnp.sum(xe, axis=0) / N
    tv = jnp.sum(xe * xe)
    y = jnp.concatenate(
        [y_raw - jnp.outer(jnp.ones((N,), x.dtype), mu @ w),
         jnp.ones((N, 1), x.dtype)], axis=1)
    return (jnp.max(jnp.abs(y)) + tv) * 1e-30


out = {}
out["A_gram_sibs"] = round(diff(a_body, (x,)) * 1e3, 2)
out["B_gram_only"] = round(diff(b_body, (x,)) * 1e3, 2)
out["C_sketch_only"] = round(diff(c_body, (x, w0, mu0)) * 1e3, 2)
out["D_sketch_sibs"] = round(diff(d_body, (x, w0)) * 1e3, 2)
out["sib_cost_in_gram"] = round(out["A_gram_sibs"] - out["B_gram_only"], 2)
out["sib_cost_in_sketch"] = round(out["D_sketch_sibs"] - out["C_sketch_only"], 2)
print(json.dumps(out))
