"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

This is the JAX-idiomatic way to test multi-chip sharding without real
hardware (see SURVEY.md §4): all sharding/collective tests run against 8
virtual CPU devices.

Subtlety: on this machine an axon ``sitecustomize`` triggers JAX's flag
parsing at interpreter startup, so setting ``XLA_FLAGS`` from inside an
already-running process is silently ignored (observed: 1 CPU device instead
of 8). Fix: when the environment wasn't prepared before startup, re-exec
pytest once with the right env -- after restoring pytest's captured stdio so
the re-exec'd run's output reaches the terminal.
"""

import os
import sys

_FLAG = "--xla_force_host_platform_device_count=8"


def _env_ready() -> bool:
    return (
        "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", "")
        and os.environ.get("JAX_PLATFORMS", "") == "cpu"
    )


def pytest_configure(config):
    if os.environ.get("_EO_TESTS_REEXEC") == "1" or _env_ready():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["_EO_TESTS_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + _FLAG).strip()
    # The axon TPU-tunnel sitecustomize (gated on PALLAS_AXON_POOL_IPS)
    # breaks xla_force_host_platform_device_count even when set at startup;
    # tests are CPU-only, so drop it from the child environment entirely.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if "axon" not in p
    )
    # persistent XLA compile cache: the suite is dominated by single-core CPU
    # compiles of many small model configs; warm reruns are minutes faster
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache_tests")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2.0")
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
