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
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # 8 virtual devices on a 1-core host: XLA's CPU collective rendezvous
    # watchdog (warn ~20s, SIGABRT at terminate timeout) can fire purely
    # from scheduler starvation when another process competes for the core
    # ("Termination timeout ... exceeded. Exiting to ensure a consistent
    # program state."). Starvation here is not a deadlock — give the
    # rendezvous room instead of crashing the suite.
    if "collective_call_terminate_timeout" not in flags:
        flags += (
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
            " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        )
    os.environ["XLA_FLAGS"] = flags
    # The tunneled TPU plugin ignores the JAX_PLATFORMS env var; the config
    # API is honored. Must run before any jax computation.
    import jax

    jax.config.update("jax_platforms", "cpu")

from neural_vit_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
