"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4 test strategy).
x64 is enabled so metric kernels can be checked bit-for-bit against
scipy/sklearn.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon site customization force-selects the TPU tunnel backend at jax
# import; override it after import (backends aren't initialized yet)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# XLA:CPU's oneDNN/XNNPACK matmuls run a relaxed-precision fast path on
# bf16-capable hosts (~1e-4 relative error) — enough to blur logit-level
# torch-parity tolerances; force exact fp32 accumulation in tests
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
