"""Persistent-compile-cache helpers.

XLA:CPU AOT artifacts are MACHINE-SPECIFIC: loading an executable compiled
on a host with different CPU features can SIGILL/SIGSEGV (observed r5: the
slow test tier segfaulted loading a ``+prefer-no-gather`` artifact left by
a previous round's machine). CPU-backend processes therefore use a cache
directory fingerprinted by the host's cpuinfo flags; the TPU cache stays
shared (TPU executables don't embed host CPU features).
"""

from __future__ import annotations

import hashlib
import os


def cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((line for line in f if line.startswith("flags")), "")
        return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        return "nofp"


def cache_dir(repo_root: str, platform: str) -> str:
    """Cache directory for a process pinned to `platform` ("cpu"/"tpu")."""
    if platform == "cpu":
        return os.path.join(repo_root, f".jax_cache_cpu_{cpu_fingerprint()}")
    return os.path.join(repo_root, ".jax_cache")


def configure(jax, repo_root: str, platform: str) -> None:
    jax.config.update("jax_compilation_cache_dir", cache_dir(repo_root, platform))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
