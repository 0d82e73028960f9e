"""centerpose_tpu — a TPU-native (JAX/XLA/Pallas) category-level 6-DoF pose framework.

A from-scratch rebuild of the capabilities of NVlabs/CenterPose (ICRA 2022) designed
for TPU hardware: one functional model core, fully fused jitted decode, batched PnP,
array-state tracking, and pjit/shard_map data parallelism over a device mesh.

Reference capability map: see SURVEY.md at the repo root. Nothing here is a port of
the reference's CUDA/torch code; file docstrings cite reference files only to document
behavioral parity targets.
"""

__version__ = "0.1.0"

from centerpose_tpu.config import CenterPoseConfig, preset  # noqa: F401
