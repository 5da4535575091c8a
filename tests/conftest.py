"""Test configuration: force an 8-device virtual CPU mesh so data/tensor
parallel paths are exercised without TPU hardware (the idiomatic-JAX answer
to multi-device testing — SURVEY.md §4).

Set LORA_TPU_TEST_BACKEND=tpu to run the suite on real hardware instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("LORA_TPU_TEST_BACKEND", "cpu") == "cpu":
    # env JAX_PLATFORMS may be pinned to the TPU plugin by the image's
    # sitecustomize; the config update below overrides it reliably.
    jax.config.update("jax_platforms", "cpu")
else:
    # TPU numerics mode: f32 matmuls default to bf16 MXU passes; tests
    # compare against f32 references, so force true-f32 contractions.
    jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402

GOLDEN_DIR = "/root/reference/example_loras"


@pytest.fixture(scope="session")
def golden_disney():
    return os.path.join(GOLDEN_DIR, "lora_disney.safetensors")


@pytest.fixture(scope="session")
def golden_svd():
    return os.path.join(GOLDEN_DIR, "analog_svd_rank4.safetensors")
