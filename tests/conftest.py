"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

This is the JAX-idiomatic way to test multi-chip sharding without real
hardware (see SURVEY.md §4): all sharding/collective tests in this suite run
against 8 virtual CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
