"""Device mesh construction and batch sharding helpers.

The reference is strictly single-device (reference: trainer.py:23 — one
``model.to(device)``; no torch.distributed anywhere). Fragment pairs are
independent, so the natural TPU scaling axis is pure data parallelism over
ICI: a 1-D ``jax.sharding.Mesh`` whose axis carries whole pairs, parameters
replicated, gradients psum'd by XLA. Batch-stat syncs are unnecessary in
the default config (bias instead of BN, reference config.py:43).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
    if num_devices > len(devices):
        raise ValueError(f"asked for {num_devices} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:num_devices]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for stacked per-device batches: leading dim split over the axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stack_shard_batch(batches, mesh: Mesh, axis: str = "data"):
    """Stack per-device batch dicts along a new leading axis and device_put
    each array with its leading dim sharded over the mesh axis."""
    import numpy as np  # local: host-side packing only

    stacked = {
        k: np.stack([b[k] for b in batches], axis=0) for k in batches[0]
    }
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in stacked.items()}
