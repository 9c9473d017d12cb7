"""Flagship-fit trace + HLO pass-count evidence (round-3 VERDICT weak #6).

DESIGN.md §7 claims the Gram-finder flagship fit moves ~16 bytes per
element of X (f32 read for the bf16 convert, bf16 write+read around the
Gram, one fused sketch+moments read, one projection read).  That claim
was wall-clock inference; this script substantiates it two ways:

1. **HLO pass counts** — compile the exact flagship program and count
   the optimized-HLO instructions that consume (read) or produce
   (write) an n×d-sized buffer.  Static evidence: every data pass is an
   instruction, so the table IS the traffic budget (up to XLA's
   fusion-internal reuse).
2. **A real ``jax.profiler`` trace** — committed next to this script so
   the fusion structure and span timeline are inspectable in
   Perfetto/TensorBoard (``utils.profiling.trace`` wraps the capture;
   tests assert it produces artifacts).

Run: ``python benchmarks/trace_flagship.py [--rows N] [--cols D]``
(CPU-sized defaults; pass the real flagship shape on a chip).  Writes
``benchmarks/TRACE_FLAGSHIP.json`` and a trace under
``benchmarks/traces/``.
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
import json
import os
import re

import petal_decomposition_tpu  # noqa: F401  (x64 + platform config first)
import jax
import jax.numpy as jnp
import numpy as np

from petal_decomposition_tpu.config import config
from petal_decomposition_tpu.ops.jacobi import warm_kernel_probes
from petal_decomposition_tpu.ops.pallas import sketch_kernel
from petal_decomposition_tpu.parallel.distributed import randomized_pca_fit
from petal_decomposition_tpu.utils.profiling import trace
from petal_decomposition_tpu.utils.rng import key_from_seed

HERE = os.path.dirname(os.path.abspath(__file__))


_WIDTH = {"f32": 4, "bf16": 2, "f64": 8, "s32": 4, "u32": 4, "pred": 1}
_NOT_A_PASS = (
    # Aliases, containers and control flow — the memory traffic they
    # imply happens in their bodies / consumers, not in the op itself.
    "parameter", "tuple", "get-tuple-element", "bitcast",
    "conditional", "while", "constant", "after-all",
)


def _big_buffer_table(hlo_text: str, n: int, d: int) -> dict:
    """Per-computation read/write passes over n×d buffers in the
    optimized HLO.

    Fusion/wrapped-reduce bodies (referenced via ``calls=``/
    ``to_apply=``) describe the *inside* of one fused pass and are
    excluded; what remains — ENTRY plus cond-branch/while bodies — is
    the executed schedule, where every instruction touching a
    data-sized buffer (n×d or its transpose d×n — e.g. an unelided
    transpose copy) is one physical memory pass.  Note cond branches
    are alternatives: only one executes per fit.
    """
    defline = re.compile(
        r"^\s*(?:ROOT\s+)?(%[\w.\-]+)\s+=\s+"
        r"((?:\([^)]*\))|(?:\w+\[[^\]]*\](?:\{[^}]*\})?))\s+"
        r"([\w\-]+)\((.*)$"
    )
    comp_start = re.compile(r"^\s*(ENTRY\s+)?(%[\w.\-]+)\s*\(.*\)\s*->")
    big = re.compile(rf"(\w+)\[(?:{n},{d}|{d},{n})\]")

    # Pass 1: symbol table (name -> output shape string) and the set of
    # computations that are fusion/reduce bodies.
    shapes: dict[str, str] = {}
    bodies: set[str] = set()
    for line in hlo_text.splitlines():
        m = defline.match(line)
        if m:
            shapes[m.group(1)] = m.group(2)
        for ref in re.findall(r"(?:calls|to_apply)=(%[\w.\-]+)", line):
            bodies.add(ref)

    # Pass 2: walk executable computations.
    per_comp: dict[str, dict] = {}
    current = None
    counted = None
    for line in hlo_text.splitlines():
        cm = comp_start.match(line)
        if cm and " = " not in line.split("->")[0]:
            name = cm.group(2)
            current = name
            counted = name not in bodies
            continue
        if current is None or not counted:
            continue
        m = defline.match(line)
        if not m:
            continue
        name, out_shape, op, rest = m.groups()
        if op in _NOT_A_PASS:
            continue
        entry = per_comp.setdefault(
            current,
            {"reads": {}, "writes": {}, "read_bytes": 0, "write_bytes": 0},
        )
        for t in big.findall(out_shape):
            if t in _WIDTH:
                key = f"{op}:{t}"
                entry["writes"][key] = entry["writes"].get(key, 0) + 1
                entry["write_bytes"] += _WIDTH[t]
        operands = rest.split("), ")[0] if ")," in rest else rest
        seen = set()
        for ref in re.findall(r"%[\w.\-]+", operands):
            if ref in seen:
                continue  # a dot reading one buffer twice streams it once
            seen.add(ref)
            for t in big.findall(shapes.get(ref, "")):
                if t in _WIDTH:
                    key = f"{op}:{t}"
                    entry["reads"][key] = entry["reads"].get(key, 0) + 1
                    entry["read_bytes"] += _WIDTH[t]
    total_r = sum(e["read_bytes"] for e in per_comp.values())
    total_w = sum(e["write_bytes"] for e in per_comp.values())
    return {
        "per_computation": per_comp,
        "read_bytes_per_element_all_paths": total_r,
        "write_bytes_per_element_all_paths": total_w,
        "total_bytes_per_element_all_paths": total_r + total_w,
    }


def run(n: int, d: int, k: int = 32, do_trace: bool = True) -> dict:
    warm_kernel_probes(jnp.float32)
    fused_ok = sketch_kernel.kernel_available()
    x = jax.random.normal(jax.random.key(0), (n, d), jnp.float32)
    key = key_from_seed(1_234_567_891_011_121_314)

    kwargs = dict(
        n_components=k, centering=True, n_oversamples=10,
        n_power_iters=2, normalizer="cholqr2", range_finder="gram",
        fused_sketch=fused_ok, cfg=config.cache_key(),
    )
    lowered = randomized_pca_fit.lower(x, key, **kwargs)
    compiled = lowered.compile()
    table = _big_buffer_table(compiled.as_text(), n, d)

    out = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "shape": [n, d],
        "k": k,
        "fused_kernel": bool(fused_ok),
        "hlo_nxd_buffer_passes": table,
        "note": (
            "reads/writes of n-by-d buffers in the optimized HLO; "
            "fusion names collapse elementwise chains so each entry is "
            "one physical memory pass. Pallas custom-calls appear as "
            "custom-call reads."
        ),
    }

    if do_trace:
        trace_dir = os.path.join(HERE, "traces", f"flagship_{out['platform']}")
        os.makedirs(trace_dir, exist_ok=True)
        with trace(trace_dir):
            sig = randomized_pca_fit(x, key, **kwargs)["sigma"]
            # Data fetch, not block_until_ready: on the tunnel stack
            # only a read guarantees remote execution completed inside
            # the capture window (benchmarks/roofline.py).
            np.asarray(jax.device_get(jnp.ravel(sig)[:1]))
        out["trace_dir"] = os.path.relpath(trace_dir, HERE)
        ops = _device_op_table(trace_dir)
        if ops:
            out["device_op_ms"] = ops
    return out


def _device_op_table(trace_dir: str) -> dict | None:
    """Top device-side op durations (ms) from the captured trace — the
    dynamic counterpart of the static HLO pass table (an op's wall IS
    its memory traffic at the measured stream rate, or its MXU time)."""
    import glob
    import gzip
    from collections import defaultdict

    files = sorted(glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*",
                     "*.trace.json.gz")
    ))
    if not files:
        return None
    with gzip.open(files[-1]) as f:
        t = json.load(f)
    events = t.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "device:" in e.get("args", {}).get("name", "").lower()
    }
    agg: dict = defaultdict(float)
    n_ev = 0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            agg[e["name"]] += e.get("dur", 0) / 1e3
            n_ev += 1
    if not agg:
        return None
    top = dict(sorted(agg.items(), key=lambda kv: -kv[1])[:12])
    return {
        "n_device_events": n_ev,
        "total_device_ms": round(sum(agg.values()), 2),
        "top_ops": {k: round(v, 2) for k, v in top.items()},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--cols", type=int, default=1024)
    ap.add_argument("--no-trace", action="store_true")
    args = ap.parse_args()
    out = run(args.rows, args.cols, do_trace=not args.no_trace)
    path = os.path.join(HERE, "TRACE_FLAGSHIP.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing[out["platform"]] = out
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
