"""Mesh construction and sharding helpers.

The framework's 2D mesh (SURVEY §2.3): ``dp`` shards read batches (data
parallel over ICI), ``mp`` shards the genome k-mer index / model tensors.
The reference has no distributed story at all (single process, shell-outs);
this layer is where the TPU build scales instead.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = ("dp", "mp"),
              devices: Optional[Sequence] = None) -> Mesh:
    devs = np.array(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devs), 1)
    if shape[0] * shape[1] != len(devs):
        raise ValueError(f"mesh shape {shape} != {len(devs)} devices")
    return Mesh(devs.reshape(shape), axis_names)


def mesh_from_config(mc, devices: Optional[Sequence] = None) -> Optional[Mesh]:
    """Build the pipeline mesh requested by a config.MeshConfig.

    Returns None when the config resolves to a single device (the identity
    case: the pipeline runs unsharded).  ``dp_size=-1`` means "all available
    devices divided by shard_size".
    """
    devs = list(devices if devices is not None else jax.devices())
    mp = max(1, mc.shard_size)
    dp = mc.dp_size
    if dp == -1:
        dp = max(1, len(devs) // mp)
    if dp * mp <= 1:
        return None
    if dp * mp > len(devs):
        raise ValueError(f"mesh {dp}x{mp} needs {dp * mp} devices, "
                         f"have {len(devs)}")
    return make_mesh((dp, mp), (mc.dp_axis, mc.shard_axis),
                     devices=devs[:dp * mp])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, arr):
    """Device-put a host batch with its leading axis split over dp."""
    return jax.device_put(arr, batch_sharding(mesh))


def pad_to_multiple(arr: np.ndarray, multiple: int, fill=0) -> np.ndarray:
    n = arr.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return arr
    pad = np.full((target - n,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)
