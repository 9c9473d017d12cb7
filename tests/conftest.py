"""Test environment: CPU backend with 8 virtual devices.

Matches SURVEY §4's multi-node testing note: sharded paths are validated
on a CPU mesh via ``--xla_force_host_platform_device_count=8``.

The ambient environment may point JAX at a remote TPU
(``JAX_PLATFORMS=axon``), where every test-sized jit pays a ~30s remote
compile; tests always force CPU.  Set ``PETAL_TEST_PLATFORM`` to
override (e.g. to run the suite on real TPU hardware).  Both the env
vars and ``jax.config`` are set because a pytest plugin may import jax
before this conftest runs.
"""

import os

_platform = os.environ.get("PETAL_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
