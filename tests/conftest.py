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
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
