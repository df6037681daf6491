"""IVF-Flat index: coarse quantizer + mesh-sharded inverted lists.

BASELINE.md config 2 ("IVF-Flat, 65,536 centroids trained on a subset;
recall@10 vs flat") — the faiss IndexIVFFlat replacement (SURVEY.md §2
#7,#11). Train = distributed spherical k-means (index/kmeans.py);
fill = assign + pack into segmented lists (index/lists.py); search =

  1. probe: streaming top-``nprobe`` over the centroid table (same fused
     kernel as flat search; centroids replicated on every device),
  2. scan: each device gathers whole segments of the probed lists it
     owns (round-robin ownership) and scores them against the queries,
  3. merge: all-gather top-k over ICI (parallel/topk_merge.py).

`nprobe` is the search-time knob the tune stage sweeps (SURVEY.md §2
#8, `params.json`).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.topk import streaming_topk
from ..parallel.mesh import SHARD_AXIS, build_mesh
from ..parallel.topk_merge import merge_topk_all_gather
from .kmeans import KMeans, _normalize_rows, _round_up
from .lists import PackedLists, pack_lists

NEG_INF = float("-inf")


class IVFFlatIndex:
    """Inverted-file index with exact (f32/bf16) residual-free list scan."""

    def __init__(
        self,
        n_lists: int,
        *,
        mesh=None,
        seg_size: int = 512,  # bigger segments amortize per-slot overhead (RESULTS.md)
        chunk: int = 1024,
        spherical: bool = True,
        impl: str = "auto",
        seed: int = 0,
    ):
        self.n_lists = n_lists
        self.mesh = mesh if mesh is not None else build_mesh()
        self.seg_size = seg_size
        self.chunk = chunk
        self.spherical = spherical
        self.impl = impl
        self.seed = seed

        self.kmeans = KMeans(
            n_lists, mesh=self.mesh, spherical=spherical, chunk=chunk, impl=impl, seed=seed
        )
        self.packed: PackedLists | None = None
        self._dev_arrays = None
        self.n = 0
        self._search_cache: dict = {}

    @property
    def ndev(self) -> int:
        return self.mesh.shape[SHARD_AXIS]

    @property
    def centroids(self) -> np.ndarray | None:
        return self.kmeans.centroids

    @property
    def is_trained(self) -> bool:
        return self.centroids is not None

    # -- train / fill -----------------------------------------------------------

    def train(self, sample: np.ndarray, *, iters: int = 10) -> dict:
        """Train the coarse quantizer; returns training stats
        (the `untuned.json` analog, reference Makefile:13)."""
        self.kmeans.fit(sample, iters=iters)
        return self.kmeans.stats

    def fill(self, vectors: np.ndarray, positions: np.ndarray | None = None) -> None:
        """Assign + pack all vectors into device-sharded lists."""
        if not self.is_trained:
            raise RuntimeError("train() before fill()")
        if self.packed is not None:
            # replace-not-append semantics would silently drop the old
            # rows (cf. IVFPQIndex.fill_stream); refill a fresh index
            raise RuntimeError(
                "index already filled; re-fill a freshly trained/loaded index"
            )
        vectors = np.asarray(vectors, np.float32)
        if self.spherical:
            vectors = _normalize_rows(vectors)
        if positions is None:
            positions = np.arange(len(vectors), dtype=np.int64)
        _, assign = self.kmeans.assign(vectors)
        packed = pack_lists(
            vectors, positions, assign, self.n_lists,
            ndev=self.ndev, seg_size=self.seg_size,
        )
        self._install(packed)

    def _install(self, packed: PackedLists) -> None:
        self.packed = packed
        self.n = packed.n_rows
        data, row_ids, seg_valid, list_segs = packed.stacked()
        shard = NamedSharding(self.mesh, P(SHARD_AXIS))
        self._dev_arrays = tuple(
            jax.device_put(a, shard) for a in (data, row_ids, seg_valid, list_segs)
        )
        self._centroids_dev = jax.device_put(
            self._padded_centroids(), NamedSharding(self.mesh, P())
        )
        self._search_cache.clear()

    def _padded_centroids(self) -> np.ndarray:
        k_pad = _round_up(self.n_lists, self.chunk)
        c = np.zeros((k_pad, self.centroids.shape[1]), np.float32)
        c[: self.n_lists] = self.centroids
        return c

    # -- search -------------------------------------------------------------------

    def _build_search(self, qn: int, k: int, nprobe: int):
        seg, M, K = self.seg_size, self.packed.max_segs, self.n_lists
        chunk, impl = self.chunk, self.impl

        def local(q, c, data, row_ids, seg_valid, list_segs):
            data, row_ids = data[0], row_ids[0]
            seg_valid, list_segs = seg_valid[0], list_segs[0]

            # 1) probe (replicated computation; centroids replicated);
            # bf16 matmul keeps the centroid chunk blocks inside VMEM
            _, probes = streaming_topk(
                q.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                jnp.int32(K), nprobe, chunk=chunk, impl=impl,
            )  # [Q, P]

            row_iota = lax.broadcasted_iota(jnp.int32, (1, seg), 1)

            # 2) scan owned segments of probed lists, one query at a time
            def per_query(args):
                qv, pl = args                       # [D], [P]
                segs = jnp.take(list_segs, pl, axis=0).reshape(-1)   # [P*M]
                owned = segs >= 0
                segc = jnp.where(owned, segs, 0)
                rows = segc[:, None] * seg + row_iota                # [P*M, seg]
                vecs = jnp.take(data, rows.reshape(-1), axis=0)      # [P*M*seg, D]
                scores = jnp.dot(
                    vecs, qv, preferred_element_type=jnp.float32
                ).reshape(-1, seg)                                   # [P*M, seg]
                live = owned[:, None] & (row_iota < jnp.take(seg_valid, segc)[:, None])
                flat = jnp.where(live, scores, NEG_INF).reshape(-1)
                if flat.shape[0] < k:  # candidate pool smaller than k
                    flat = jnp.pad(flat, (0, k - flat.shape[0]), constant_values=NEG_INF)
                v, idx = lax.top_k(flat, k)
                row_lookup = rows.reshape(-1)
                if row_lookup.shape[0] < k:
                    row_lookup = jnp.pad(row_lookup, (0, k - row_lookup.shape[0]))
                pos = jnp.take(row_ids, row_lookup[idx])
                pos = jnp.where(v > NEG_INF, pos, -1)
                return v, pos

            v, pos = lax.map(per_query, (q, probes))

            # 3) global merge
            return merge_topk_all_gather(v, pos, k, SHARD_AXIS)

        fn = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(), P()) + (P(SHARD_AXIS),) * 4,
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def search(self, queries: np.ndarray, k: int, *, nprobe: int = 8):
        """Return (scores [Q,k], corpus positions [Q,k]; -1 = no candidate)."""
        if self._dev_arrays is None:
            raise RuntimeError("fill() before search()")
        q = np.asarray(queries, np.float32)
        if self.spherical:
            q = _normalize_rows(q)
        nprobe = min(nprobe, self.n_lists)
        key = (q.shape[0], k, nprobe)
        if key not in self._search_cache:
            self._search_cache[key] = self._build_search(*key)
        v, pos = self._search_cache[key](
            jnp.asarray(q), self._centroids_dev, *self._dev_arrays
        )
        return np.asarray(v), np.asarray(pos, np.int64)

    # -- artifacts -------------------------------------------------------------------

    def save(self, directory: str | Path) -> None:
        """Persist trained+filled state (the empty.faiss/index.faiss analog)."""
        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        np.save(d / "centroids.npy", self.centroids)
        meta = {
            "type": "ivf_flat",
            "n_lists": self.n_lists,
            "seg_size": self.seg_size,
            "spherical": self.spherical,
            "n": self.n,
            "kmeans_stats": self.kmeans.stats,
        }
        (d / "meta.json").write_text(json.dumps(meta, indent=2))
        if self.packed is not None:
            data, row_ids, seg_valid, list_segs = self.packed.stacked()
            np.savez_compressed(
                d / "lists.npz",
                data=data, row_ids=row_ids, seg_valid=seg_valid, list_segs=list_segs,
                seg_size=self.seg_size, n_rows=self.packed.n_rows,
                max_segs=self.packed.max_segs,
            )

    @classmethod
    def load(cls, directory: str | Path, *, mesh=None, **kw) -> "IVFFlatIndex":
        d = Path(directory)
        meta = json.loads((d / "meta.json").read_text())
        idx = cls(
            meta["n_lists"], mesh=mesh, seg_size=meta["seg_size"],
            spherical=meta["spherical"], **kw,
        )
        idx.kmeans.centroids = np.load(d / "centroids.npy")
        idx.kmeans.stats = meta.get("kmeans_stats", {})
        lists_file = d / "lists.npz"
        if lists_file.exists():
            z = np.load(lists_file)
            from .lists import DeviceLists

            ndev_saved = z["data"].shape[0]
            if ndev_saved != idx.ndev:
                raise ValueError(
                    f"saved for {ndev_saved} devices, mesh has {idx.ndev}; refill needed"
                )
            per_dev = [
                DeviceLists(z["data"][i], z["row_ids"][i], z["seg_valid"][i], z["list_segs"][i])
                for i in range(ndev_saved)
            ]
            idx._install(
                PackedLists(
                    per_device=per_dev, seg_size=int(z["seg_size"]),
                    n_lists=meta["n_lists"], n_rows=int(z["n_rows"]),
                    max_segs=int(z["max_segs"]),
                )
            )
        return idx
