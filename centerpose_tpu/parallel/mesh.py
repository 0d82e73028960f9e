"""Device mesh + sharding configuration.

The reference's entire distributed story is a single-process, multi-GPU
DataParallel fork with uneven chunk sizes (src/lib/models/data_parallel.py:10-129,
scatter_gather.py:6-39, chunk sizes from --master_batch_size in opts.py:358-367).

The TPU-native replacement: a 1-D `data` mesh over all chips; batches are sharded on
axis 0 with NamedSharding, parameters are replicated, and gradient reduction is the
psum XLA inserts under jit — the ICI is the "communication backend". The
uneven-chunk feature has no TPU analogue (chips are homogeneous) and is dropped by
design (SURVEY §2.2).

A second `model` axis is supported for spatial sharding of the (large) stride-4
feature maps in giant-batch serving; unused by default.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def replicate_spec() -> P:
    return P()


def batch_spec(axis: str = "data") -> P:
    return P(axis)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a pytree of host arrays onto the mesh, sharding axis 0 of each leaf."""
    def put(x):
        spec = P(axis) if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
