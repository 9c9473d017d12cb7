"""Global configuration for the TPU-native decomposition library.

The reference selects its native backend (MKL / Netlib / OpenBLAS /
Accelerate) at compile time via cargo features (ref: src/lib.rs:4-11,
Cargo.toml:28-39).  On TPU there is a single XLA backend; "backend
selection" becomes a runtime choice of *linalg implementation* and
*matmul precision*:

* ``linalg_backend``:
    - ``"auto"``   — per-dtype dispatch: float64/complex128 use the
      in-house Jacobi solvers (the only way to reach 1e-10 accuracy on
      TPU, whose built-in SVD/eigh lowerings carry f32-grade internals),
      float32/complex64 use XLA's built-ins (MXU-optimized QDWH) whose
      ~1e-7 vector accuracy is at the f32 noise floor anyway.
    - ``"jacobi"`` — always use the in-house Jacobi SVD / eigh.
    - ``"xla"``    — always use ``jnp.linalg`` lowerings.
* ``matmul_precision``: passed to every ``jnp.dot`` in the compute path.
  ``"highest"`` keeps f32 matmuls in true f32 (TPU default is bf16-ish
  and loses ~3 decimal digits, far outside the 1e-5 f32 parity band).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

__all__ = ["config", "Config"]


@dataclass
class Config:
    linalg_backend: str = "auto"  # "auto" | "jacobi" | "xla" | "native"
    matmul_precision: str = "highest"
    # Max Jacobi sweeps before declaring non-convergence (LinalgError
    # analogue of LAPACK info != 0; ref: linalg.rs:84).
    jacobi_max_sweeps: int = 30
    # Check convergence and raise LinalgError on failure.  Disable inside
    # fully-jitted pipelines where host sync is undesirable.
    check_convergence: bool = True
    # "auto" backend: offload factorizations of problems at most this
    # many elements to the native host core when the active device is an
    # accelerator.  Tiny fits are dispatch-latency-bound on TPU; on a
    # locally-attached host the C++ core wins decisively.  Default 0
    # (disabled) because this build environment reaches its TPU over a
    # remote tunnel where host↔device transfers cost ~20 ms each and the
    # offload measured slower (169 vs 125 ms on the 1000×64 f64 fit);
    # set to e.g. 1<<18 on hosts with PCIe-attached accelerators.
    host_offload_max_elements: int = 0
    # Complex-dtype fits/transforms on an accelerator default backend:
    # "auto" dispatches them to the host CPU device (complex128 XLA:TPU
    # programs compile impractically slowly on this stack — DESIGN.md
    # §2 — and the reference's c32/c64 support runs on CPU/LAPACK
    # anyway); "default" leaves placement alone.  Mesh fits are never
    # redirected (an explicit device mesh wins).
    complex_device: str = "auto"

    def validate(self) -> None:
        if self.linalg_backend not in ("auto", "jacobi", "xla", "native"):
            raise ValueError(f"unknown linalg backend: {self.linalg_backend}")
        if self.complex_device not in ("auto", "default"):
            raise ValueError(f"unknown complex_device: {self.complex_device}")

    def cache_key(self) -> tuple:
        """Hashable snapshot of the fields that alter traced programs.
        Jitted fit pipelines take this as a static argument so config
        changes retrace instead of silently reusing stale dispatch.
        (``check_convergence`` and ``host_offload_max_elements`` act
        outside traces — neither belongs here.)"""
        return (
            self.linalg_backend,
            self.matmul_precision,
            self.jacobi_max_sweeps,
        )


config = Config(
    linalg_backend=os.environ.get("PETAL_LINALG_BACKEND", "auto"),
)
config.validate()


def enable_x64() -> None:
    """Enable 64-bit JAX types (call before creating any arrays)."""
    import jax

    jax.config.update("jax_enable_x64", True)


if not os.environ.get("PETAL_TPU_NO_X64"):
    # The reference is an f64-first LAPACK library; mirror that default so
    # float64 numpy inputs are not silently truncated to f32.
    enable_x64()


def _honor_platform_env() -> None:
    """Restore JAX's documented ``JAX_PLATFORMS`` semantics: some
    out-of-tree plugins (the remote-TPU ``axon`` one among them)
    register themselves regardless of the env var, so
    ``JAX_PLATFORMS=cpu python script.py`` silently — or, during a
    relay outage, hangingly — still initializes the remote backend
    (the plugin's sitecustomize sets the ``jax_platforms`` config flag
    directly, clobbering the env var).  The env var is JAX's documented
    user override, so it wins unconditionally here; set it (or call
    ``jax.config.update`` after import) to choose differently."""
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    try:
        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except AttributeError:  # very old jax
        pass


_honor_platform_env()


def _cpu_flags() -> str:
    """Stable fingerprint of the host CPU's ISA extensions (Linux); an
    empty string elsewhere — the machine/processor fields still salt."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return " ".join(sorted(line.split(":", 1)[1].split()))
    except OSError:
        pass
    return ""


def enable_compilation_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at ``path``.

    The QDWH + refined-eigh f64 SVD route costs a one-time multi-minute
    XLA compile (docs/DESIGN.md); the reference's LAPACK backend has
    zero warm-up, so matching its usability means never paying that
    compile twice.  Enabled at import (default
    ``~/.cache/petal_tpu_jax_<cpu-fingerprint>`` — salted per host CPU
    flavor, see `_cpu_flags`); opt out with
    ``PETAL_TPU_NO_COMPILE_CACHE=1`` or override the location with
    ``PETAL_TPU_COMPILE_CACHE_DIR``.
    """
    import jax

    if path is None:
        path = os.environ.get("PETAL_TPU_COMPILE_CACHE_DIR")
    if path is None:
        # Salt the default location with the host CPU identity: cached
        # XLA:CPU executables are ahead-of-time machine code, and a
        # cache written on one microarchitecture loads on another with
        # only a warning ("could lead to execution errors such as
        # SIGILL") — observed when a shared home directory crossed an
        # AMX-capable and a non-AMX host.  TPU executables are serialized
        # per accelerator target and unaffected; the salt merely splits
        # the directory per host flavor.  (A load-time warning naming
        # only "+prefer-no-scatter/+prefer-no-gather" is a same-machine
        # false positive: those are XLA compile-option pseudo-features
        # that LLVM host detection never reports, so every AOT entry
        # "mismatches" on them even where it was written.)
        import hashlib
        import platform

        salt = hashlib.sha256(
            f"{platform.machine()}:{platform.processor()}:"
            f"{_cpu_flags()}".encode()
        ).hexdigest()[:12]
        path = os.path.join(
            os.path.expanduser("~"), ".cache", f"petal_tpu_jax_{salt}"
        )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache every compile that costs ≥ 1 s — the tiny-probe compiles
        # stay out, every pipeline/kernel compile is captured.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):  # unwritable FS / very old jax
        pass


if not os.environ.get("PETAL_TPU_NO_COMPILE_CACHE"):
    enable_compilation_cache()
