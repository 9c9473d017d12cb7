"""Multi-host initialization helpers.

A mesh can span every chip in a multi-host TPU slice: each host runs the
same program, calls :func:`initialize` once before any jax use, and
builds the mesh from ``jax.devices()`` (which then lists the global
device set).  Collectives ride ICI within the slice and DCN across
slices — still with no code changes to the fit pipelines, which only see
sharding annotations.

The reference has no distributed analogue at all (SURVEY §2.3); the
restart story here is the serialization contract: a fit is one-shot, so
recovery = reload the last saved model (``save``/``load``) and re-run —
matching SURVEY §5's "restartable from serialized model state".
"""

from __future__ import annotations

import jax

__all__ = ["initialize", "is_multihost", "process_index"]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the JAX distributed runtime (idempotent wrapper over
    ``jax.distributed.initialize``; no-ops on single-process setups
    where auto-detection finds no cluster)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # Already initialized, or single-process with no cluster env.
        pass


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()
