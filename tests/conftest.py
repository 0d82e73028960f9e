"""Test harness config: force an 8-device virtual CPU platform so multi-chip
sharding paths (mesh/pjit/shard_map) are exercised without TPU hardware.

NOTE: JAX_PLATFORMS is force-overridden (the environment pre-sets it to the TPU
tunnel); tests must run on the virtual CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual devices share ONE core here: threads can reach a collective
    # rendezvous minutes apart on the real-shape (512²) train step, and XLA
    # CPU's default 40 s termination timeout abort()s the process
    # (rendezvous.cc "Exiting to ensure a consistent program state").
    # (the matching warn_stuck flag is not registered in this jaxlib — the
    # 20 s "may be stuck" warnings remain, harmless)
    flags = flags + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (import after env setup)

# The image's sitecustomize force-registers the axon TPU plugin and pins
# jax_platforms before conftest runs; override through the live config.
jax.config.update("jax_platforms", "cpu")

# Deterministic fp32 numerics for parity tests (JAX's default matmul precision
# uses bfloat16 passes; the env-var spelling is not read by this JAX version).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: repeat test sessions skip recompiling the
# unchanged (often minutes-long on this 1-core host) jitted programs.
from centerpose_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
