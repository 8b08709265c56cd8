"""Persistent XLA compilation cache.

Full-scale SeerUNet compiles take tens of minutes through the axon
remote-compile tunnel; caching them on disk makes the second run instant.
Call once at process start (all entry points + bench do).
"""
from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def host_cpu_fingerprint() -> str:
    """Short hash of the host's CPU feature flags.

    XLA:CPU cache entries are AOT machine code compiled for the build
    host's exact CPU features; JAX's cache key does NOT include them, so an
    entry written on one machine can SIGILL on another (observed: a
    train.py subprocess completing all steps then dying without a
    traceback while loading a cached executable — the cpu_aot_loader
    logs 'Machine type used for XLA:CPU compilation doesn't match').
    Keying the CPU cache directory by this fingerprint confines entries to
    identical hosts; TPU executables are device code and stay unkeyed.
    """
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    return platform.machine() or "unknown"


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    path = os.path.abspath(cache_dir or os.environ.get("JAX_CACHE_DIR", DEFAULT_CACHE_DIR))
    if jax.default_backend() == "cpu":
        path = f"{path}-cpu-{host_cpu_fingerprint()}"
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def set_compile_effort(effort: str) -> None:
    """Trade XLA optimization time for compile time.

    ``fast`` drops the exec-time optimization effort to its minimum — the
    flagship train-step backward is a huge graph whose cold compile
    otherwise exceeds the remote-compile tunnel's lifetime (STATUS.md
    round-1 blocker); measured step-time impact is small and the persistent
    cache makes later runs free either way.  ``default`` leaves XLA alone.
    ``max`` raises the effort to its maximum — worth it for a serving
    executable compiled once and reused for millions of clips.
    """
    if effort == "default":
        return
    if effort == "max":
        jax.config.update("jax_exec_time_optimization_effort", 1.0)
        return
    if effort != "fast":
        raise ValueError(
            f"compile_effort must be 'fast', 'default' or 'max', got {effort!r}")
    jax.config.update("jax_exec_time_optimization_effort", -1.0)
