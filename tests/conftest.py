"""Test configuration: run everything on a virtual 8-device CPU platform.

This is the analog of the reference's float-mode C-sim (model.h.jinja:18-37)
— the exact device code runs without accelerator hardware — and gives
multi-chip semantics for sharding tests via
``--xla_force_host_platform_device_count`` (SURVEY.md section 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: this environment's sitecustomize imports jax at interpreter start
# with JAX_PLATFORMS=axon baked in, so the env var is already consumed —
# the config update below is the only way to force the CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
