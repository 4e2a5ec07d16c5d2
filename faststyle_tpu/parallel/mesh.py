"""Device-mesh helpers.

The parallelism story (SURVEY.md §2.6): the transform net is ~424K params, so
the only shardings that pay are data parallelism for training (grads psum
over ICI) and batch sharding for inference — params stay replicated. TP/PP/
SP/EP are deliberately not implemented: at this size any weight sharding adds
collective latency for zero memory benefit; the omission is a design
decision, not a gap.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or given) devices with a single 'data' axis."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; trailing dims replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to_devices(batch: np.ndarray, n_devices: int) -> tuple[np.ndarray, int]:
    """Pad the batch (repeating the last image) so it divides the mesh; returns
    (padded, original_size). Static per-shape — jit caches stay warm."""
    n = batch.shape[0]
    rem = n % n_devices
    if rem == 0:
        return batch, n
    pad = n_devices - rem
    return np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)]), n
