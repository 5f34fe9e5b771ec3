"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests never touch the real TPU chip; multi-chip sharding is validated on a
virtual CPU mesh (xla_force_host_platform_device_count=8), per the driver's
dryrun contract. Note the environment pins JAX_PLATFORMS=axon via
sitecustomize, so we must override through jax.config, not the env var.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the MSM/NTT graphs are expensive to build once
# BZ_NO_COMPILE_CACHE=1 disables the persistent cache: serializing the
# multi-GB sharded-prover CPU executables segfaults in the cache writer
# (zstd/AOT path) — the slow tier runs with it off.
if os.environ.get("BZ_NO_COMPILE_CACHE", "") in ("", "0"):
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
