"""Persistent XLA compilation cache.

Train-step compiles run 30-400 s per process on the tunneled TPU backend
(and tens of seconds on the 8-virtual-device CPU mesh the tests use), and
every CLI entry point pays it again. JAX's persistent compilation cache
keys executables by (HLO, flags, backend) content hash, so re-runs of
bench/tests/scripts skip straight to execution. Verified to work over the
remote axon TPU plugin.

Call `enable_compilation_cache()` before the first jax computation. It is
a no-op if the user already configured a cache dir.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "neural_vit_tpu", "xla_cache"
)


def _cpu_feature_tag() -> str:
    """Machine-feature key for CPU cache directories.

    XLA:CPU persistent-cache entries embed AOT-compiled machine code for
    the HOST's exact CPU feature set — loading an entry produced on a
    different machine logs "could lead to execution errors such as SIGILL"
    and can crash mid-run. (TPU executables have no such coupling: they
    target the remote chip, so sharing/committing them is safe.) Keying
    the CPU cache path by a hash of the host's CPU flags makes a foreign
    machine miss cleanly and recompile instead of loading stale AOT code.
    """
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith(("flags", "features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    basis = f"{platform.machine()}|{feats}"
    return "cpu-" + hashlib.sha256(basis.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (created if
    missing). Respects an existing JAX_COMPILATION_CACHE_DIR / config
    setting; returns the directory in effect. On the CPU backend the
    directory gains a machine-feature-hash suffix (see `_cpu_feature_tag`)."""
    import jax

    configured = jax.config.jax_compilation_cache_dir
    if configured:
        return configured
    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_DIR
    )
    if jax.default_backend() == "cpu":
        cache_dir = os.path.join(cache_dir, _cpu_feature_tag())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything, including sub-second compiles: the suite compiles
    # hundreds of small jits and the wins compound.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
