"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU with 8 virtual devices so the multi-chip sharding
paths compile and execute without TPU hardware; the real chip is used
only by bench.py.

Two knobs are needed because the environment may auto-register a TPU
platform plugin at interpreter start (sitecustomize):

* `jax.config.update("jax_platforms", "cpu")` — overrides any
  programmatic platform selection done by a plugin;
* `XLA_FLAGS=--xla_force_host_platform_device_count=8` — must be in the
  env before the CPU backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
assert jax.default_backend() == "cpu", jax.default_backend()

import pytest

_TEST_COUNT = [0]


@pytest.fixture(autouse=True)
def _periodic_cache_clear():
    """Release compiled executables every ~30 tests: a full-suite run
    accumulates hundreds of XLA CPU programs in one process and the
    compiler segfaults near test ~180 (reproducible at the same spot,
    never in isolated runs).  Clearing the jit cache periodically keeps
    the process under that threshold at the cost of a few re-compiles."""
    yield
    _TEST_COUNT[0] += 1
    if _TEST_COUNT[0] % 30 == 0:
        jax.clear_caches()
