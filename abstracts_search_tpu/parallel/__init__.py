"""Mesh construction and cross-device communication.

The reference has no distributed backend at all — its "communication" is
files + Unix pipes (SURVEY.md §2 parallelism table; reference
Makefile:62-65). The TPU-native scaling axis is *corpus sharding*: the
207M-vector corpus is sharded across a `jax.sharding.Mesh`, each device
scans its shard, and per-device top-k results are merged with an
all-gather over ICI. k-means training uses `psum` centroid accumulation
over the same mesh.
"""

from .mesh import build_mesh, corpus_sharding, replicated_sharding, shard_rows
from .topk_merge import merge_topk_all_gather

__all__ = [
    "build_mesh",
    "corpus_sharding",
    "replicated_sharding",
    "shard_rows",
    "merge_topk_all_gather",
]
