"""Device mesh bootstrap.

One 2-D mesh ('data', 'model') carries the whole framework: corpus shards
and batches ride 'data', tensor-parallel encoder weights ride 'model'
(SURVEY.md §5.8 — the TPU-native replacement for the reference's
thread-pool-over-HTTP parallelism).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    model_parallel = max(1, min(model_parallel, n))
    while n % model_parallel:
        model_parallel -= 1
    data = n // model_parallel
    arr = np.asarray(devices).reshape(data, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, *trailing: Optional[str]) -> NamedSharding:
    """Leading axis over 'data', remaining axes as given."""
    return NamedSharding(mesh, P(DATA_AXIS, *trailing))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(mesh: Mesh, arr, pad_value: float = 0.0):
    """Put a host array on the mesh with rows sharded over 'data'.

    Pads the row count to a multiple of the data-axis size. Returns
    (device_array, original_row_count).
    """
    import jax.numpy as jnp

    arr = np.asarray(arr)
    d = mesh.shape[DATA_AXIS]
    n = arr.shape[0]
    n_pad = ((n + d - 1) // d) * d
    if n_pad != n:
        pad = np.full((n_pad - n,) + arr.shape[1:], pad_value, arr.dtype)
        arr = np.concatenate([arr, pad], axis=0)
    return jax.device_put(jnp.asarray(arr), data_sharding(mesh, *([None] * (arr.ndim - 1)))), n
