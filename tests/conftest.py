"""Test environment: run JAX on a virtual 8-device CPU mesh by default.

Multi-chip hardware isn't available in CI; sharding is validated on a faked
8-device CPU platform (the driver separately dry-runs the multi-chip path via
`__graft_entry__.dryrun_multichip`). Set NEURAL_VIT_TEST_TPU=1 to run the
suite against the real chip instead.
"""

import os

if not os.environ.get("NEURAL_VIT_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The tunneled TPU plugin ignores the JAX_PLATFORMS env var; the config
    # API is honored. Must run before any jax computation.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
