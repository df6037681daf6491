"""IVF-Flat index: coarse quantizer + mesh-sharded inverted lists.

BASELINE.md config 2 ("IVF-Flat, 65,536 centroids trained on a subset;
recall@10 vs flat") — the faiss IndexIVFFlat replacement (SURVEY.md §2
#7,#11). Train = distributed spherical k-means (index/kmeans.py);
fill = assign + pack into CSR segmented lists (index/lists.py); search
is two-phase and work-proportional like IVF-PQ (index/ivfpq.py):

  1. probe (jit): streaming top-``nprobe`` over the centroid table
     (same fused kernel as flat search; centroids replicated),
  2. host: expand the probed lists through each device's CSR into a
     ragged per-query slot table (exactly the live segments),
  3. scan (jit, shard_map): per query, gather its probed segments and
     score them with one [slots*SEG, D] x [D] matvec, top-k, then
     all-gather merge over ICI (parallel/topk_merge.py).

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
from ..parallel.mesh import SHARD_AXIS, build_mesh, global_put
from ..parallel.topk_merge import merge_topk_all_gather
from .kmeans import KMeans, _assign_operands, _normalize_rows, _round_up
from .lists import (
    CSRLists,
    bucket_size,
    load_lists,
    pack_lists,
    ragged_ranges,
    save_lists,
    shard_lists,
)

NEG_INF = float("-inf")


def _next_pow2(v: int, lo: int = 1) -> int:
    v = max(int(v), lo)
    return 1 << (v - 1).bit_length()


class IVFFlatIndex:
    """Inverted-file index with exact (f32) residual-free list scan."""

    def __init__(
        self,
        n_lists: int,
        *,
        mesh=None,
        seg_size: int = 512,
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
        self.packed: CSRLists | None = None
        self._dev_arrays = None
        self.n = 0
        self._search_cache: dict = {}
        import threading

        self._compile_lock = threading.Lock()  # single-flight compile

    def _cached_fn(self, key, builder):
        fn = self._search_cache.get(key)
        if fn is None:
            with self._compile_lock:
                fn = self._search_cache.get(key)
                if fn is None:
                    fn = builder()
                    self._search_cache[key] = fn
        return fn

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
        """Assign + pack all vectors into the CSR lists."""
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
            vectors, positions, assign, self.n_lists, seg_size=self.seg_size
        )
        self._install(packed)

    def _install(self, packed: CSRLists) -> None:
        self.packed = packed
        self.n = packed.n_rows
        shards = shard_lists(packed, self.ndev)
        data = shards.data
        if not self.spherical:
            # plain-L2 scan: store rows with a -||row||^2/2 bias column
            # (query side appends a 1), so the scan's IP matvec ranks by
            # exact L2 — q.x - ||x||^2/2 is per-query monotone in
            # -||q - x||^2. Dead padding rows are zero -> bias 0, and
            # stay masked by seg_valid as before. Column padded to a
            # 128 multiple (TPU minor-dim tiling, CLAUDE.md).
            d = data.shape[-1]
            pad = _round_up(d + 1, 128) - d
            aug = np.zeros(data.shape[:-1] + (d + pad,), np.float32)
            aug[..., :d] = data
            aug[..., d] = -0.5 * np.einsum("...d,...d->...", data, data)
            data = aug
        self._dev_arrays = tuple(
            global_put(a, self.mesh, P(SHARD_AXIS))
            for a in (data, shards.row_ids, shards.seg_valid)
        )
        self._seg_start_h = shards.seg_start.astype(np.int64)
        self._seg_cnt_h = shards.seg_cnt.astype(np.int64)
        self._centroids_dev = global_put(self._padded_centroids(), self.mesh)
        self._search_cache.clear()

    def _padded_centroids(self) -> np.ndarray:
        k_pad = _round_up(self.n_lists, self.chunk)
        c = np.zeros((k_pad, self.centroids.shape[1]), np.float32)
        c[: self.n_lists] = self.centroids
        return c

    # -- search -------------------------------------------------------------------

    def _build_probe(self, qn: int, nprobe: int):
        chunk, impl, K = self.chunk, self.impl, self.n_lists
        spherical = self.spherical

        def probe(q, c):
            # plain-L2 probes nearest centroids via the bias trick
            # through the same kernel (round-4 VERDICT weak #6);
            # bf16-vs-f32 selection lives in _assign_operands
            qq, cc = _assign_operands(q, c, spherical)
            _, probes = streaming_topk(
                qq, cc, jnp.int32(K), nprobe, chunk=chunk, impl=impl,
            )
            return probes

        return jax.jit(probe)

    def _build_slots(self, probes: np.ndarray, nprobe: int):
        """Per-device ragged slot tables (see IVFPQIndex._build_slots;
        IVF-Flat only needs seg_ids + the per-query slot table)."""
        qn = probes.shape[0]
        ndev = self._seg_cnt_h.shape[0]
        pl_flat = probes.reshape(-1).astype(np.int64)

        per_dev, maxcnts = [], []
        for d in range(ndev):
            cnt = self._seg_cnt_h[d][pl_flat]
            seg_ids, _ = ragged_ranges(self._seg_start_h[d][pl_flat], cnt)
            percnt = cnt.reshape(qn, nprobe).sum(axis=1)
            per_dev.append((seg_ids, percnt))
            maxcnts.append(int(percnt.max()) if qn else 0)

        maxcnt = _next_pow2(max(maxcnts), lo=1)
        bucket = bucket_size(max(len(s) for s, _ in per_dev))
        seg_out = np.zeros((ndev, bucket), np.int32)
        soq = np.full((ndev, qn, maxcnt), -1, np.int32)
        ar = np.arange(maxcnt, dtype=np.int64)
        for d, (seg_ids, percnt) in enumerate(per_dev):
            seg_out[d, : len(seg_ids)] = seg_ids
            qoff = np.concatenate([[0], np.cumsum(percnt)])[:-1]
            mask = ar[None, :] < percnt[:, None]
            soq[d] = np.where(mask, qoff[:, None] + ar[None, :], -1).astype(np.int32)
        return seg_out, soq, bucket, maxcnt

    def _build_scan(self, qn: int, k: int, bucket: int, maxcnt: int):
        seg = self.seg_size

        def local(q, data, row_ids, seg_valid, seg_ids, slots_of_q):
            data, row_ids, seg_valid = data[0], row_ids[0], seg_valid[0]
            seg_ids, slots_of_q = seg_ids[0], slots_of_q[0]
            row_iota = lax.broadcasted_iota(jnp.int32, (1, seg), 1)

            # per query: gather its probed segments, one matvec, top-k.
            # lax.map keeps the [maxcnt, SEG, D] gather transient — the
            # whole batch's tiles would not fit HBM at production dims.
            def per_query(args):
                qv, soq = args                              # [D], [maxcnt]
                livec = soq >= 0
                segs_q = jnp.take(seg_ids, jnp.clip(soq, 0, None))   # [maxcnt]
                tiles = jnp.take(data, segs_q, axis=0)      # [maxcnt, SEG, D]
                # HIGHEST: this scan's contract is EXACT f32 scoring
                # (class docstring); XLA:TPU's default would run the
                # f32 matvec as bf16 passes (round-5 review finding)
                scores = jnp.einsum("msd,d->ms", tiles, qv,
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.HIGHEST)
                live = livec[:, None] & (
                    row_iota < jnp.take(seg_valid, segs_q)[:, None]
                )
                flat = jnp.where(live, scores, NEG_INF).reshape(-1)
                rows = (segs_q[:, None] * seg + row_iota).reshape(-1)
                if flat.shape[0] < k:
                    flat = jnp.pad(flat, (0, k - flat.shape[0]),
                                   constant_values=NEG_INF)
                    rows = jnp.pad(rows, (0, k - rows.shape[0]))
                v, idx = lax.top_k(flat, k)
                pos = jnp.take(row_ids.reshape(-1), rows[idx])
                pos = jnp.where(v > NEG_INF, pos, -1)
                return v, pos

            v, pos = lax.map(per_query, (q, slots_of_q))
            return merge_topk_all_gather(v, pos, k, SHARD_AXIS)

        fn = shard_map(
            local, mesh=self.mesh,
            in_specs=(P(),) + (P(SHARD_AXIS),) * 5,
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
        qn = q.shape[0]

        probe_fn = self._cached_fn(
            ("probe", qn, nprobe), lambda: self._build_probe(qn, nprobe)
        )
        probes = np.asarray(probe_fn(jnp.asarray(q), self._centroids_dev))

        seg_ids, soq, bucket, maxcnt = self._build_slots(probes, nprobe)
        if not self.spherical:
            # match the installed bias-augmented rows: q gets a ones
            # column, so the scan's f32 matvec is exact L2 ranking
            # (scores = q.x - ||x||^2/2, per-query monotone in -L2)
            pad = _round_up(q.shape[1] + 1, 128) - q.shape[1]
            q = np.concatenate(
                [q, np.ones((qn, 1), np.float32),
                 np.zeros((qn, pad - 1), np.float32)], axis=1)
        scan_fn = self._cached_fn(
            ("scan", qn, k, bucket, maxcnt),
            lambda: self._build_scan(qn, k, bucket, maxcnt),
        )
        v, pos = scan_fn(
            jnp.asarray(q), *self._dev_arrays,
            global_put(seg_ids, self.mesh, P(SHARD_AXIS)),
            global_put(soq, self.mesh, P(SHARD_AXIS)),
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
            save_lists(self.packed, d / "lists")

    @classmethod
    def load(cls, directory: str | Path, *, mesh=None, **kw) -> "IVFFlatIndex":
        """Reopen on ANY mesh size (CSR artifacts are device-count-
        independent; sharding is applied at install time)."""
        d = Path(directory)
        meta = json.loads((d / "meta.json").read_text())
        idx = cls(
            meta["n_lists"], mesh=mesh, seg_size=meta["seg_size"],
            spherical=meta["spherical"], **kw,
        )
        idx.kmeans.centroids = np.load(d / "centroids.npy")
        idx.kmeans.stats = meta.get("kmeans_stats", {})
        lists_dir = d / "lists"
        if lists_dir.is_dir():
            idx._install(load_lists(lists_dir, mmap=False))
        return idx
