"""Persistent-compile-cache helpers.

XLA:CPU AOT cache entries bake in the compiling host's CPU features; this
container migrates between hosts across sessions, and loading a stale
entry from another machine warns "machine feature mismatch … may SIGILL"
(and has produced real crashes). Key the CPU cache directory by a host
fingerprint so a migrated container starts a fresh cache instead of
loading another machine's code. TPU entries are target-keyed by the
compiler itself, so the TPU cache can stay shared.
"""

from __future__ import annotations

import hashlib
import os


def host_fingerprint() -> str:
    """Stable per-host id from the CPU model + feature flags."""
    try:
        info = open("/proc/cpuinfo").read()
        lines = [ln for ln in info.splitlines()
                 if ln.startswith(("model name", "flags"))]
        blob = "\n".join(lines[:2])
    except OSError:
        blob = os.uname().machine
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


def cpu_cache_dir(base: str = "/root/jax_cache") -> str:
    return f"{base}_cpu_{host_fingerprint()}"


def enable_cpu_cache(base: str = "/root/jax_cache") -> str:
    """Point JAX's persistent compilation cache at the host-keyed CPU dir
    (idempotent; returns the directory). Caching CPU compiles matters for
    the test suite: XLA:CPU's compile path segfaults rarely but repeatably
    in long many-compile processes — warm cache entries skip LLVM codegen
    entirely on reruns (and cut suite wall-time)."""
    import jax

    d = cpu_cache_dir(base)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # default threshold (1 s) only caches the big graphs; cache everything
    # non-trivial — the suite compiles thousands of small jits and reruns
    # want to skip LLVM wholesale
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return d
