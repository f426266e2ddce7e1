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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_last_module = [None]


@pytest.fixture(autouse=True)
def _bound_jit_cache(request):
    """Clear jax's compilation caches at every test-MODULE boundary.

    The full suite compiles thousands of distinct executables in one
    process; holding them all alive segfaults XLA:CPU late in the run
    (observed: SIGSEGV inside backend_compile_and_load at ~90% of the
    suite, reproducible only cumulatively — individual modules always
    pass). Per-module clearing bounds live JIT code while keeping
    within-module caching (the expensive repeated compiles are intra-
    module: same model spec across cases)."""
    mod = request.node.nodeid.split("::", 1)[0]
    if _last_module[0] is not None and mod != _last_module[0]:
        jax.clear_caches()
    _last_module[0] = mod
    yield
