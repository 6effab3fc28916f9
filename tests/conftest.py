"""Test config: force an 8-device virtual CPU platform BEFORE jax import.

Substitutes for multi-chip hardware per SURVEY.md §4(c): GSPMD sharding /
collective tests run on `--xla_force_host_platform_device_count=8`.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
