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
# persistent compile cache: the MSM/NTT graphs are expensive to build once.
# Serializing multi-GB XLA:CPU executables segfaults in the cache writer
# (zstd/AOT path, see NEXT_STEPS.md crash signature), so the writer is
# SIZE-GATED below instead of blanket-disabled: normal executables stay
# cached even in the slow tier, only pathological ones skip the write.
# BZ_NO_COMPILE_CACHE=1 remains a manual kill switch.
if os.environ.get("BZ_NO_COMPILE_CACHE", "") in ("", "0"):
    # CPU caches are MACHINE-FINGERPRINTED: XLA:CPU AOT results compiled on
    # a host with different CPU features SIGSEGV/SIGILL when loaded (r5: the
    # slow tier crashed in test_signed_device_msm_vs_host loading a
    # +prefer-no-gather artifact from a previous machine). The TPU cache
    # (.jax_cache, used by bench.py) is unaffected — TPU executables are
    # machine-independent here. (battlezips_halo2_tpu/utils/jaxcache.py)
    from battlezips_halo2_tpu.utils.jaxcache import cache_dir as _bz_cache_dir

    _cache_dir = _bz_cache_dir(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cpu"
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# generated-code size above which the persistent-cache write is skipped
# (the observed writer segfaults were on multi-GB CPU executables)
_CACHE_MAX_CODE_BYTES = int(os.environ.get("BZ_CACHE_MAX_CODE_BYTES", str(1 << 30)))

from jax._src import compilation_cache as _cc  # noqa: E402

_orig_put = _cc.put_executable_and_time


def _size_gated_put(cache_key, module_name, executable, backend, compile_time):
    try:
        ma = executable.memory_analysis()
        code_bytes = int(getattr(ma, "generated_code_size_in_bytes", 0))
    except Exception:
        code_bytes = 0
    if code_bytes > _CACHE_MAX_CODE_BYTES:
        print(
            f"[conftest] persistent-cache write SKIPPED for {module_name}: "
            f"generated code {code_bytes/2**30:.2f} GiB > gate "
            f"{_CACHE_MAX_CODE_BYTES/2**30:.2f} GiB (writer segfault guard)",
            flush=True,
        )
        return None
    return _orig_put(cache_key, module_name, executable, backend, compile_time)


_cc.put_executable_and_time = _size_gated_put


def pytest_configure(config):
    # quick subset: `pytest -m "not heavy"` — excludes production-k golden
    # verification and pathological-XLA-CPU-compile tests (README "Testing")
    config.addinivalue_line(
        "markers",
        "heavy: production-k or compile-heavy tests; quick tier skips via -m 'not heavy'",
    )
