"""Host-side storage: SQLite embedding store + parquet shard I/O.

Replaces the reference's `sidecar-search init/build/dump` storage layer
(SURVEY.md §1 L1-L2; reference Makefile:46-49,65,71-72,98-100).
"""

from .sqlite_store import EmbeddingStore
from .shards import ShardWriter, ShardReader, dump_store_to_shards, load_shards_to_store
from .idmap import IdMap

__all__ = [
    "EmbeddingStore",
    "IdMap",
    "ShardWriter",
    "ShardReader",
    "dump_store_to_shards",
    "load_shards_to_store",
]
