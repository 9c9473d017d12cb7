"""Piecewise timing of the flagship gram-finder pipeline stages.

Each stage is timed with the roofline harness's 2N-N fori_loop
differencing (scalar data dependence threaded through the loop so XLA
can neither hoist nor DCE the stage), at the exact flagship operating
point: 1M x 1024 f32, k=32, l=42, q=2, gram bf16.
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
from petal_decomposition_tpu.ops.linalg import cholesky_qr2, mdot, svd_jit_cert, svd_flip
import jax, jax.numpy as jnp, numpy as np, time, functools, json

N, D, L = 1_000_000, 1024, 42
x = jax.random.normal(jax.random.key(1), (N, D), jnp.float32)
w0 = jax.random.normal(jax.random.key(2), (D, L), jnp.float32)
q0 = jax.random.normal(jax.random.key(3), (N, L), jnp.float32)
g0 = jnp.dot(x[:4096].T, x[:4096], precision="default")
b0 = jax.random.normal(jax.random.key(4), (L, D), jnp.float32)
jax.block_until_ready((x, w0, q0, g0, b0))


def _flush(r):
    np.asarray(jax.device_get(jnp.ravel(r)[:1]))


def timed(fn, *args, reps=3):
    r = fn(*args); _flush(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _flush(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def diff_time(make_body, init, args, iters=8):
    @functools.partial(jax.jit, static_argnames=("k",))
    def run(init, *args, k):
        return jax.lax.fori_loop(0, k, make_body(*args), init)
    t1 = timed(functools.partial(run, k=iters), init, *args)
    t2 = timed(functools.partial(run, k=2 * iters), init, *args)
    return max(t2 - t1, 1e-9) / iters


out = {}

# 1. gram_moments: one read of X -> bf16 Gram + sibling col-sums + sqnorm
def gm_body(x):
    def body(_, s):
        xe = x + s  # fused into the read
        g = jnp.dot(xe.T, xe, precision="default")
        mu = jnp.sum(xe, axis=0)
        tv = jnp.sum(xe * xe)
        return (jnp.sum(jnp.abs(g)) + jnp.sum(jnp.abs(mu)) + tv) * 1e-30
    return body
out["gram_moments"] = diff_time(gm_body, jnp.float32(0), (x,), iters=4)

# 2. gram_subspace: q=2 iterations of qr(G @ W) on the d x d operator
def gs_body(g):
    def body(_, w):
        for _i in range(2):
            w = jnp.linalg.qr(mdot(g, w), mode="reduced")[0]
        return w
    return body
out["gram_subspace_q2"] = diff_time(gs_body, w0, (g0,), iters=8)

# 3. sketch: Y = (X - mu) @ W  (one data read, rank-1 centering fused)
mu = jnp.sum(x, axis=0) / N
def sk_body(x, mu):
    def body(_, w):
        y = mdot(x, w) - jnp.outer(jnp.ones((1,), x.dtype), mdot(mu[None, :], w))[0][None, :]
        return w + jnp.max(jnp.abs(y)) * 1e-30
    return body
out["sketch_centered"] = diff_time(sk_body, w0, (x, mu), iters=4)

# 3b. the fused sketch+moments Pallas kernel (the pass that replaces
# sketch + the sibling moments pass on the default accelerator path).
from petal_decomposition_tpu.ops.pallas import sketch_kernel  # noqa: E402
if sketch_kernel.kernel_available():
    def fk_body(x, w0):
        def body(_, s):
            y, cs, sq = sketch_kernel.fused_sketch_moments(x + s, w0)
            return (jnp.max(jnp.abs(y)) + jnp.max(jnp.abs(cs)) + sq) * 1e-30
        return body
    out["fused_sketch_moments_kernel"] = diff_time(
        fk_body, jnp.float32(0), (x, w0), iters=4
    )

# 4. final orthonormalization: CholeskyQR2 of the 1M x 42 panel
def cq_body():
    def body(_, q):
        q2 = cholesky_qr2(q)
        return q2 + jnp.float32(1e-30)
    return body
out["cholqr2_1Mx42"] = diff_time(cq_body, q0, (), iters=4)

# 5. projection: B = Q^T (X - mu)  (one data read at 'highest')
def pj_body(x, q, mu):
    def body(_, s):
        b = mdot(q.T, x + s) - jnp.outer(mdot(q.T, jnp.ones((N, 1), x.dtype))[:, 0], mu)
        return jnp.max(jnp.abs(b)) * 1e-30
    return body
out["project_highest"] = diff_time(pj_body, jnp.float32(0), (x, q0, mu), iters=4)

# 6. SVD of B (42 x 1024) with certificate
def sb_body(b):
    def body(_, s):
        u_b, sig, vt, off = svd_jit_cert(b + s)
        return (jnp.max(sig) + jnp.max(jnp.abs(u_b)) + jnp.max(jnp.abs(vt)) + off) * 1e-30
    return body
out["svd_b_42x1024"] = diff_time(sb_body, jnp.float32(0), (b0,), iters=4)

# 7. recovery + svd_flip: U = Q @ U_B, deterministic signs
ub0 = jnp.linalg.qr(jax.random.normal(jax.random.key(5), (L, L), jnp.float32))[0]
def rc_body(q, ub, b):
    def body(_, s):
        u = mdot(q, ub + s)
        u2, vt2 = svd_flip(u, b)
        return (jnp.max(jnp.abs(u2)) + jnp.max(jnp.abs(vt2))) * 1e-30
    return body
out["recover_flip"] = diff_time(rc_body, jnp.float32(0), (q0, ub0, b0), iters=4)

total = sum(out.values())
print(json.dumps({k: round(v * 1e3, 2) for k, v in out.items()}))
print("stage_total_ms:", round(total * 1e3, 1))
