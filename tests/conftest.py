"""Test env: force an 8-virtual-device CPU JAX backend.

Tests exercise kernels via Pallas interpret mode and multi-chip sharding via
``xla_force_host_platform_device_count`` — our 'fake backend', deliberately
better than the reference, which required a real GPU for every check
(SURVEY.md §4.4).

This container's sitecustomize force-registers the 'axon' TPU backend (and
pins ``jax_platforms``) before conftest runs, so plain env vars are too late;
instead we update the jax config in-process before any backend initializes.
Set TPUL2_TEST_ON_TPU=1 to run the suite on the real chip instead.
"""

import os
import sys

# Repo root importable when pytest is run from elsewhere.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("TPUL2_TEST_ON_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
