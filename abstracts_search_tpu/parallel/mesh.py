"""Device mesh helpers.

One logical axis, ``shard``, carries the corpus: row-sharded corpus
tensors, replicated queries/centroids. Index search and k-means both run
as SPMD programs over this mesh (`shard_map`), with XLA inserting ICI
collectives. A second optional axis, ``tp``, is used by the encoder for
tensor parallelism (models/stella.py); search structures only use
``shard``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"
TP_AXIS = "tp"


def build_mesh(devices=None, *, tp: int = 1) -> Mesh:
    """Build a (shard, tp) mesh over the given (default: all) devices.

    With tp=1 this is the 1-D corpus mesh used by all index operations.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, (SHARD_AXIS, TP_AXIS))


def corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the corpus axis, trailing dims replicated."""
    return NamedSharding(mesh, P(SHARD_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(x: np.ndarray, mesh: Mesh, *, pad_value: float = 0.0):
    """Pad rows to a multiple of the shard axis size and device_put sharded.

    Returns (sharded_array, n_valid). Padding rows are masked out by
    consumers via n_valid (XLA needs static, equal per-device shapes).
    """
    ndev = mesh.shape[SHARD_AXIS]
    n = x.shape[0]
    per = -(-n // ndev)
    padded = per * ndev
    if padded != n:
        pad = np.full((padded - n,) + x.shape[1:], pad_value, dtype=x.dtype)
        x = np.concatenate([x, pad], axis=0)
    return jax.device_put(x, corpus_sharding(mesh)), n
