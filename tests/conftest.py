"""Test rig: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; collectives and sharding are tested
against XLA's host-platform device emulation (SURVEY.md §4).
"""
import os

# Force CPU even when a TPU plugin is registered by sitecustomize (the axon
# environment exports JAX_PLATFORMS=axon; a plain setdefault would keep it).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
