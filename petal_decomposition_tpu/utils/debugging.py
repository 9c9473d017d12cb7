"""Numerical-safety tooling.

The reference's memory-safety risk zone is its ``unsafe`` surface
(``vec_uninit``, ``assume_init`` — SURVEY §5 race-detection row, which
also documents one real latent UB in the ICA whitening, C13).  The
pure-functional JAX rebuild has no such surface; the equivalent
diagnostics here are numeric:

* :func:`nan_debugging` — flush-on-NaN for every computation
  (``jax.debug_nans``), catching non-finite intermediates at the op that
  produced them;
* :func:`check_finite` — explicit guard for user entry points.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from ..errors import InvalidInput

__all__ = ["nan_debugging", "check_finite"]


@contextlib.contextmanager
def nan_debugging():
    """Raise at the first op producing NaN/Inf inside the context."""
    with jax.debug_nans(True):
        yield


def check_finite(x, what: str = "input") -> None:
    """Eagerly validate that an array is fully finite."""
    if not bool(jnp.all(jnp.isfinite(x))):
        raise InvalidInput(f"{what} contains non-finite values")
