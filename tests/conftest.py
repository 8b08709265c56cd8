"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere."""
import os
import sys

# Fresh-checkout collection: the suite must run without `pip install -e .` or
# a PYTHONPATH export.  The package lives at the repo root (this file's
# parent's parent), so put that on sys.path before any test imports
# `seervideoldm_tpu` or the root-level entry scripts.
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS from the env;
# force CPU explicitly so tests run on the 8 virtual host devices.
jax.config.update("jax_platforms", "cpu")

# CPU backend lowers fp32 matmuls to reduced precision by default; parity
# tests compare against torch fp32, so force full precision.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: on this 1-core box XLA compiles dominate the
# suite wall-clock; warm-cache runs are the every-commit workflow.  A
# tests-dedicated dir (the 8-virtual-device/highest-precision configs would
# pollute the entry-point cache keys anyway).
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tests")
# XLA:CPU cache entries are host-specific AOT code; key the dir by the CPU
# feature fingerprint so a box swap can't SIGILL the suite (utils/cache.py
# has the full story).
from seervideoldm_tpu.utils.cache import host_cpu_fingerprint  # noqa: E402

_cache_dir = f"{_cache_dir}-{host_cpu_fingerprint()}"
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass
