"""Exact flat inner-product index, shard-parallel over a TPU mesh.

BASELINE.md benchmark config 1 ("exact flat inner-product search over one
2,097,152-row shard") and the recall oracle for IVF/PQ tuning (SURVEY.md
§7 steps 2, 9).

Design: the corpus is row-sharded over the mesh's ``shard`` axis
(`parallel.mesh.corpus_sharding`), queries are replicated. Search is a
`shard_map` SPMD program: each device runs the fused streaming top-k over
its rows (`ops.streaming_topk`, Pallas on TPU), then the per-device
results are merged with one all-gather over ICI
(`parallel.topk_merge.merge_topk_all_gather`). Replaces the faiss
IndexFlatIP + OpenMP scan with MXU matmuls; corpus lives in HBM as
bfloat16 (half the bandwidth of f32 at equal recall for unit vectors).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..parallel.mesh import SHARD_AXIS, build_mesh, corpus_sharding
from ..parallel.topk_merge import merge_topk_all_gather
from ..ops.topk import streaming_topk


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class FlatIndex:
    """Exact IP search over a mesh-sharded corpus."""

    def __init__(self, mesh=None, *, chunk: int = 1024, dtype=None, impl: str = "auto"):
        self.mesh = mesh if mesh is not None else build_mesh()
        self.chunk = chunk
        self.impl = impl
        if dtype is None:
            dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        self.dtype = dtype
        self.n = 0
        self._x = None          # [ndev * per, D] sharded over SHARD_AXIS
        self._per = 0           # rows per device (padded)
        self._search_cache: dict = {}

    @property
    def ndev(self) -> int:
        return self.mesh.shape[SHARD_AXIS]

    @property
    def dim(self) -> int | None:
        return None if self._x is None else self._x.shape[1]

    # -- build ---------------------------------------------------------------

    def add(self, vectors: np.ndarray) -> None:
        """Append rows to the corpus (re-pads and re-shards)."""
        vectors = np.asarray(vectors)
        if self._x is None:
            base = vectors
        else:
            host = np.asarray(self._x[: self.n]).astype(vectors.dtype)
            base = np.concatenate([host, vectors], axis=0)
        self._set_corpus(base)

    def _set_corpus(self, vectors: np.ndarray) -> None:
        n, d = vectors.shape
        per = _round_up(_round_up(n, self.ndev) // self.ndev, self.chunk)
        padded = per * self.ndev
        buf = np.zeros((padded, d), dtype=np.float32)
        buf[:n] = vectors
        from ..parallel.mesh import global_put

        # host-side cast (bf16 via ml_dtypes) so the multi-controller
        # install path can slice a plain numpy array per local shard
        x = buf.astype(np.dtype(self.dtype), copy=False)
        self._x = global_put(x, self.mesh, P(SHARD_AXIS))
        self.n = n
        self._per = per
        self._search_cache.clear()

    # -- search ---------------------------------------------------------------

    def _build_search_fn(self, qn: int, k: int):
        mesh, per, n, chunk, impl = self.mesh, self._per, self.n, self.chunk, self.impl

        def local(q, x):
            dev = lax.axis_index(SHARD_AXIS)
            offset = dev * per
            local_valid = jnp.clip(n - offset, 0, per)
            v, i = streaming_topk(q, x, local_valid, k, chunk=chunk, impl=impl)
            return merge_topk_all_gather(v, i + offset, k, SHARD_AXIS)

        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(SHARD_AXIS)),
            out_specs=(P(), P()),
            # the scan carry inside streaming_topk starts unvarying and
            # becomes device-varying; skip the VMA replication check
            check_vma=False,
        )
        return jax.jit(fn)

    def search(self, queries: np.ndarray, k: int):
        """Return (scores [Q, k] f32, positions [Q, k] i64 np arrays).

        Positions index the corpus in insertion order; the caller maps
        them through ids.parquet (SURVEY.md §1 L3 `ids.parquet`).
        """
        if self._x is None:
            raise RuntimeError("index is empty")
        q = jnp.asarray(np.asarray(queries), dtype=self.dtype)
        key = (q.shape[0], k)
        if key not in self._search_cache:
            self._search_cache[key] = self._build_search_fn(*key)
        v, i = self._search_cache[key](q, self._x)
        return np.asarray(v), np.asarray(i, dtype=np.int64)
