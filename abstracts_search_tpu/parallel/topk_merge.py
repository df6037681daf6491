"""Cross-device top-k merge.

The TPU-native replacement for faiss's single-node result heap
(SURVEY.md §2 #11 "all-gather top-k merge"): each device produces its
local (values, global-row-indices) top-k; an `all_gather` over the shard
axis rides ICI, then every device reduces the gathered [ndev*k]
candidates back to k. Results are replicated — exactly what the serving
layer wants (any host can read them without extra transfers).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def merge_topk_all_gather(values, indices, k: int, axis_name: str):
    """Merge per-device top-k inside a shard_map body.

    values, indices: [Q, k_local] per device, indices already offset to
    global row numbers. Returns replicated ([Q, k], [Q, k]).
    """
    # [ndev, Q, k_local] on every device after the gather
    all_v = lax.all_gather(values, axis_name)
    all_i = lax.all_gather(indices, axis_name)
    ndev, q, kl = all_v.shape
    all_v = jnp.transpose(all_v, (1, 0, 2)).reshape(q, ndev * kl)
    all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(q, ndev * kl)
    top_v, sel = lax.top_k(all_v, k)
    top_i = jnp.take_along_axis(all_i, sel, axis=1)
    return top_v, top_i
