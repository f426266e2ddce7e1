"""Test configuration: run everything on a virtual 8-device CPU mesh.

In this environment jax is partially preloaded at interpreter start
(PYTHONPATH=/root/.axon_site) with JAX_PLATFORMS=axon, so setting platform
env vars here is too late — use jax.config.update instead. XLA_FLAGS still
works because backends initialize lazily.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
