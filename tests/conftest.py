"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via XLA's
host-platform device-count override (standard JAX practice).  The image's
sitecustomize pins JAX_PLATFORMS=axon (remote TPU tunnel) — tests must
hard-override to CPU *before* jax initializes a backend, otherwise every
compile goes through the remote-compile relay (~50 s per op).
"""

import os

# Must run before any jax backend initialization (conftest is imported before
# test modules, and nothing imports jax at collection time).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent-cache writes segfault jaxlib on the multi-device CPU backend
# (serialized-executable path); tests never benefit from the cache anyway
os.environ["ISAACGYMENV_TPU_NO_CACHE"] = "1"

# sitecustomize's axon.register() already ran at interpreter start and did
# jax.config.update("jax_platforms", "axon,cpu"), which overrides the env
# var.  Counter-update before any backend is initialized (register binds
# lazily, so no backend exists yet at conftest import time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"

import pytest  # noqa: E402

_tests_since_clear = {"n": 0}


@pytest.fixture(autouse=True)
def _bound_live_executables():
    """Free compiled executables periodically across the suite.

    The monolithic run compiles 150+ distinct XLA programs (the 40-task
    registry smoke alone compiles an env-step program per task); with all
    of them held live, XLA:CPU's next backend_compile_and_load eventually
    segfaults (observed twice at ~test #118, jax/_src/compiler.py:362).
    Dropping the jit caches every few tests bounds live-executable count;
    recompiles are cheap relative to a crashed suite.
    """
    yield
    _tests_since_clear["n"] += 1
    if _tests_since_clear["n"] >= 8:
        _tests_since_clear["n"] = 0
        jax.clear_caches()
