"""Test harness config: force an 8-device virtual CPU platform so multi-chip
sharding paths (mesh/pjit/shard_map) are exercised without TPU hardware.

NOTE: JAX_PLATFORMS is force-overridden (the environment pre-sets it to the TPU
tunnel); tests must run on the virtual CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (import after env setup)

# The image's sitecustomize force-registers the axon TPU plugin and pins
# jax_platforms before conftest runs; override through the live config.
jax.config.update("jax_platforms", "cpu")

# Deterministic fp32 numerics for parity tests (JAX's default matmul precision
# uses bfloat16 passes; the env-var spelling is not read by this JAX version).
jax.config.update("jax_default_matmul_precision", "highest")
