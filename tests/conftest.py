"""Test configuration: force a virtual 8-device CPU mesh before JAX import.

Multi-device sharding tests run on forced host devices (the standard way to
test multi-device JAX code without a pod; SURVEY.md section 4 item 6).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize registers the TPU plugin and pins
# jax_platforms=axon before conftest runs; override back to hermetic CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from falcon_r1cs_tpu.falcon import make_instance
from falcon_r1cs_tpu.params import FALCON_512, FALCON_1024


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


@pytest.fixture(scope="session")
def inst_512(rng):
    return make_instance(rng, FALCON_512)


@pytest.fixture(scope="session")
def inst_1024(rng):
    return make_instance(rng, FALCON_1024)
