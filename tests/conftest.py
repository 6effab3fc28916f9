"""Test config: force an 8-device virtual CPU platform.

Substitutes for multi-chip hardware per SURVEY.md §4(c): GSPMD sharding /
collective tests run on ``--xla_force_host_platform_device_count=8``.

Note: this session's environment registers an `axon` TPU PJRT plugin at
interpreter startup (sitecustomize) and pins ``jax_platforms="axon,cpu"`` via
jax.config — env vars alone cannot override it, so we update the config
directly. Unit tests must NOT run on the tunneled TPU (remote compiles are
~30s each).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # XLA:CPU's parallel LLVM codegen segfaults intermittently on some
    # hosts (two suite runs died inside backend_compile_and_load at
    # unrelated tests); serializing codegen removes the race
    + " --xla_cpu_parallel_codegen_split_count=1"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Host-keyed persistent compile cache: skips LLVM codegen on reruns and
# never loads AOT code compiled on a different machine (this container
# migrates hosts; foreign entries warn "feature mismatch … may SIGILL").
from accessory_tpu.util.compile_cache import enable_cpu_cache  # noqa: E402

enable_cpu_cache()

# The full suite compiles ~2000 jits; every loaded XLA:CPU executable adds
# memory maps and the process crosses vm.max_map_count (65530 default)
# ~60-90% in, at which point mmap failures surface as segfaults inside
# executable load/deserialize (diagnosed 2026-08-18: maps grew 7.7k -> 22k
# in 45 s of test_sphinx alone). Raising the sysctl needs root; instead
# drop compiled-executable references whenever the map count nears the
# limit — the persistent cache makes the recompiles cheap reloads.
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _bound_loaded_executables():
    yield
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > 40_000:
        jax.clear_caches()
