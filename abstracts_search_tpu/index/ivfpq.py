"""OPQ + IVF-PQ index — the production index (BASELINE.md config 4).

Replaces the reference's trained faiss index (`empty.faiss` ->
`index.faiss` + `ondisk.ivfdata`, SURVEY.md §2 #7,#9,#11) with the
faiss "OPQ{M},IVF{K},PQ{M}" recipe rebuilt TPU-first:

- OPQ rotation trained on the sample (index/opq.py),
- coarse spherical k-means on rotated vectors (index/kmeans.py),
- PQ codebooks trained on *residuals* (x_rot - centroid[assign]),
- fill: rotate, assign, PQ-encode residuals, pack codes into the
  segmented mesh-sharded lists (index/lists.py) at M bytes/vector,
- search (ADC, inner product): because score = q . (c_list + decode(r)),
  the per-list term q . c_list is EXACTLY the probe score already
  computed by the centroid top-k, and the residual term is a lookup-
  table sum over one shared LUT [M, ksub] per query. So: probe with the
  fused streaming top-k, build LUTs with one einsum on the MXU, scan
  code segments adding bias + LUT sums, all-gather merge.

Memory: M=64, nbits=8 at 1024 dims = 64 B/vector + 4 B position =
~14 GB for the 207M corpus across a mesh — the released-index budget
class (SURVEY.md §6).
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
from .opq import OPQ
from .pq import ProductQuantizer

NEG_INF = float("-inf")


class IVFPQIndex:
    def __init__(
        self,
        n_lists: int,
        dim: int,
        *,
        pq_m: int = 64,
        pq_nbits: int = 8,
        use_opq: bool = True,
        mesh=None,
        seg_size: int = 512,  # bigger segments amortize per-slot overhead (RESULTS.md)
        chunk: int = 1024,
        spherical: bool = True,
        impl: str = "auto",
        scan_impl: str = "auto",
        storage: str = "device",
        seed: int = 0,
    ):
        self.n_lists = n_lists
        self.dim = dim
        self.mesh = mesh if mesh is not None else build_mesh()
        self.seg_size = seg_size
        self.chunk = chunk
        self.spherical = spherical
        self.impl = impl
        # scan_impl: "map" (per-query XLA gather scan), "slots" (the
        # Pallas ADC kernel over (query, segment) slots), "auto"
        self.scan_impl = scan_impl
        # storage: "device" = packed lists live in HBM across the mesh;
        # "host" = lists stay in host RAM and probed segments are
        # gathered per batch — the OnDiskInvertedLists analog
        # (reference `ondisk.ivfdata`, Makefile:11; SURVEY.md §5) for
        # corpora whose codes exceed aggregate HBM.
        self.storage = storage
        self.seed = seed
        self.use_opq = use_opq

        # Spherical coarse quantizer: in `-N` mode vectors are unit-norm and
        # rotation preserves norms, so max-cosine assignment == min-L2 with
        # unit centroids. (Plain-L2 mode would need an L2 assignment op;
        # the reference pipeline always runs -N, README.md:60.)
        self.kmeans = KMeans(
            n_lists, mesh=self.mesh, spherical=True,
            chunk=chunk, impl=impl, seed=seed,
        )
        self.pq = ProductQuantizer(dim, pq_m, pq_nbits, mesh=self.mesh, seed=seed)
        self.opq = OPQ(dim, pq_m, pq_nbits, mesh=self.mesh, seed=seed) if use_opq else None
        self.rotation = np.eye(dim, dtype=np.float32)

        self.packed: PackedLists | None = None
        self._dev_arrays = None
        self.n = 0
        self.train_stats: dict = {}
        self._search_cache: dict = {}

    @property
    def ndev(self) -> int:
        return self.mesh.shape[SHARD_AXIS]

    @property
    def is_trained(self) -> bool:
        return self.kmeans.centroids is not None and self.pq.is_trained

    # -- train ------------------------------------------------------------------

    def train(self, sample: np.ndarray, *, kmeans_iters: int = 10,
              opq_iters: int = 3, pq_iters: int = 10) -> dict:
        sample = np.asarray(sample, np.float32)
        if self.spherical:
            sample = _normalize_rows(sample)

        if self.use_opq:
            self.opq.train(sample, outer_iters=opq_iters, pq_iters=max(4, pq_iters // 2))
            self.rotation = self.opq.rotation
        from .opq import _rotate

        xr = _rotate(sample, self.rotation)

        self.kmeans.fit(xr, iters=kmeans_iters)

        _, assign = self.kmeans.assign(xr)
        residuals = xr - self.kmeans.centroids[assign]
        self.pq.train(residuals, iters=pq_iters)

        self.train_stats = {
            "kmeans": self.kmeans.stats,
            "pq": self.pq.stats,
            "opq": self.opq.stats if self.use_opq else None,
            "pq_m": self.pq.m,
            "pq_nbits": self.pq.nbits,
        }
        return self.train_stats

    # -- fill --------------------------------------------------------------------

    def _build_encode_fused(self):
        """One device round trip per chunk: rotate -> coarse-assign ->
        residual -> PQ-encode, all on the mesh. (The naive composition
        uploads each chunk 4x and downloads twice — at fill scale the
        host<->device link is the bottleneck, not compute.)"""
        chunk, impl, K = self.chunk, self.impl, self.n_lists
        m_pq, dsub, ksub = self.pq.m, self.pq.dsub, self.pq.ksub

        def local(x, rot, c, pqc):
            xr = jnp.dot(x, rot, preferred_element_type=jnp.float32)
            _, idx = streaming_topk(
                xr.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                jnp.int32(K), 1, chunk=chunk, impl=impl,
            )
            a = idx[:, 0]
            res = xr - jnp.take(c, a, axis=0)
            r3 = res.reshape(res.shape[0], m_pq, dsub)
            dots = jnp.einsum("nmd,mkd->nmk", r3, pqc,
                              preferred_element_type=jnp.float32)
            c2 = jnp.sum(jnp.square(pqc), axis=-1)          # [M, ksub]
            codes = jnp.argmin(c2[None] - 2.0 * dots, axis=-1).astype(jnp.int32)
            return a, codes

        fn = shard_map(
            local, mesh=self.mesh,
            in_specs=(P(SHARD_AXIS), P(), P(), P()),
            out_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
            check_vma=False,
        )
        return jax.jit(fn)

    def encode(self, vectors: np.ndarray, *, batch_rows: int = 1 << 18
               ) -> tuple[np.ndarray, np.ndarray]:
        """-> (list assignment [N], residual PQ codes [N, M] uint8)."""
        x = np.asarray(vectors, np.float32)
        if self.spherical:
            x = _normalize_rows(x)
        if not hasattr(self, "_encode_fused"):
            self._encode_fused = self._build_encode_fused()
        rot = jnp.asarray(self.rotation)
        c = jnp.asarray(self._padded_centroids())
        pqc = jnp.asarray(self.pq.centroids)

        n = len(x)
        ndev = self.ndev
        assign = np.empty(n, np.int64)
        codes = np.empty((n, self.pq.m), np.uint8)
        for lo in range(0, n, batch_rows):
            xc = x[lo : lo + batch_rows]
            per = _round_up(_round_up(len(xc), ndev) // ndev, 8)
            total = per * ndev
            if total != len(xc):
                xc = np.concatenate([xc, np.zeros((total - len(xc), x.shape[1]), x.dtype)])
            a, cd = self._encode_fused(jnp.asarray(xc), rot, c, pqc)
            take = min(batch_rows, n - lo)
            assign[lo : lo + take] = np.asarray(a)[:take]
            codes[lo : lo + take] = np.asarray(cd)[:take].astype(np.uint8)
        return assign, codes

    def fill(self, vectors: np.ndarray, positions: np.ndarray | None = None) -> None:
        if positions is None:
            positions = np.arange(len(vectors), dtype=np.int64)
        self.fill_stream([(vectors, positions)])

    def fill_stream(self, chunks) -> None:
        """Stream (vectors, positions) chunks: encode each chunk on the
        mesh, keep only the M-byte codes host-side, pack once at the end.
        At 207M rows the raw f32 vectors are ~850 GB — only the codes
        (~13 GB at M=64) ever live in host RAM, which is the
        OnDiskInvertedLists-shaped memory story (SURVEY.md §7 'hard
        parts': fill must stream shards through device memory)."""
        if not self.is_trained:
            raise RuntimeError("train() before fill()")
        if self.packed is not None:
            # a second fill would REPLACE the packed lists while callers
            # may expect append; refills go through a fresh index (the
            # reference re-fills from the empty.faiss artifact each sync,
            # Makefile:23-25 — never appends to a filled one)
            raise RuntimeError(
                "index already filled; load the empty (trained) artifacts "
                "and re-fill the full corpus instead of appending"
            )
        codes_parts, assign_parts, pos_parts = [], [], []
        for vectors, positions in chunks:
            assign, codes = self.encode(vectors)
            codes_parts.append(codes)
            assign_parts.append(assign)
            pos_parts.append(np.asarray(positions))
        packed = pack_lists(
            np.concatenate(codes_parts),
            np.concatenate(pos_parts),
            np.concatenate(assign_parts),
            self.n_lists,
            # host-resident lists are one logical shard in host RAM
            ndev=self.ndev if self.storage == "device" else 1,
            seg_size=self.seg_size,
        )
        self._install(packed)

    def _install(self, packed: PackedLists) -> None:
        self.packed = packed
        self.n = packed.n_rows
        repl = NamedSharding(self.mesh, P())
        if self.storage == "device":
            stacked = packed.stacked()
            shard = NamedSharding(self.mesh, P(SHARD_AXIS))
            self._dev_arrays = tuple(jax.device_put(a, shard) for a in stacked)
        else:
            # host mode: lists stay as numpy; the search gathers probed
            # segments per batch and ships only those to the device
            dl = packed.per_device[0]
            self._host_codes3 = dl.data.reshape(-1, self.seg_size, self.pq.m)
            self._host_row_ids = dl.row_ids
            self._host_seg_valid = dl.seg_valid
            self._host_list_segs = dl.list_segs
            self._dev_arrays = ()
        self._centroids_dev = jax.device_put(self._padded_centroids(), repl)
        self._pq_cent_dev = jax.device_put(self.pq.centroids, repl)
        self._rot_dev = jax.device_put(self.rotation, repl)
        self._search_cache.clear()

    def _padded_centroids(self) -> np.ndarray:
        k_pad = _round_up(self.n_lists, self.chunk)
        c = np.zeros((k_pad, self.dim), np.float32)
        c[: self.n_lists] = self.kmeans.centroids
        return c

    # -- search -------------------------------------------------------------------

    def _build_search(self, qn: int, k: int, nprobe: int):
        scan = self.scan_impl
        if scan == "auto":
            scan = "slots" if jax.default_backend() == "tpu" else "map"
        if scan == "map":
            return self._build_search_map(qn, k, nprobe)
        return self._build_search_slots(qn, k, nprobe)

    def _build_search_slots(self, qn: int, k: int, nprobe: int):
        """Slot-based scan: one Pallas ADC call over all (query, probed
        segment) pairs of the batch (ops/adc.py), then one fused XLA
        bias+mask+top-k. This is the TPU production path."""
        seg, msegs, K = self.seg_size, self.packed.max_segs, self.n_lists
        chunk, impl = self.chunk, self.impl
        m_pq, ksub, dsub = self.pq.m, self.pq.ksub, self.pq.dsub

        from ..ops.adc import adc_scan_pallas

        def local(q, rot, c, pqc, data, row_ids, seg_valid, list_segs):
            data, row_ids = data[0], row_ids[0]
            seg_valid, list_segs = seg_valid[0], list_segs[0]
            n_segs = seg_valid.shape[0]
            codes3 = data.reshape(n_segs, seg, m_pq)

            qr = jnp.dot(q, rot, preferred_element_type=jnp.float32)
            # probe SELECTION in bf16 (VMEM/bandwidth), then recompute the
            # exact f32 q.c_list bias for just the chosen lists — the bias
            # feeds the ADC scores, so it must not carry bf16 rounding
            _, probes = streaming_topk(
                qr.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                jnp.int32(K), nprobe, chunk=chunk, impl=impl,
            )  # [Q, P]
            c_sel = jnp.take(c, probes.reshape(-1), axis=0).reshape(qn, nprobe, -1)
            bias = jnp.einsum("qpd,qd->qp", c_sel, qr,
                              preferred_element_type=jnp.float32)
            luts = jnp.einsum(
                "qmd,mkd->qmk", qr.reshape(qn, m_pq, dsub), pqc,
                preferred_element_type=jnp.float32,
            )

            segs = jnp.take(list_segs, probes, axis=0)        # [Q, P, msegs]
            seg_flat = segs.reshape(-1)                       # [n_slots]
            owned = seg_flat >= 0
            segc = jnp.where(owned, seg_flat, 0)
            q_ids = jnp.repeat(
                jnp.arange(qn, dtype=jnp.int32), nprobe * msegs
            )

            scores = adc_scan_pallas(codes3, luts, segc, q_ids)   # [n_slots, SEG]
            slot_bias = jnp.repeat(bias.reshape(-1), msegs)[:, None]
            scores = scores + slot_bias

            row_iota = lax.broadcasted_iota(jnp.int32, (1, seg), 1)
            live = owned[:, None] & (row_iota < jnp.take(seg_valid, segc)[:, None])
            flat = jnp.where(live, scores, NEG_INF).reshape(qn, -1)
            rows = (segc[:, None] * seg + row_iota).reshape(qn, -1)
            if flat.shape[1] < k:
                flat = jnp.pad(flat, ((0, 0), (0, k - flat.shape[1])),
                               constant_values=NEG_INF)
                rows = jnp.pad(rows, ((0, 0), (0, k - rows.shape[1])))
            v, idx = lax.top_k(flat, k)
            pos = jnp.take(row_ids, jnp.take_along_axis(rows, idx, axis=1))
            pos = jnp.where(v > NEG_INF, pos, -1)
            return merge_topk_all_gather(v, pos, k, SHARD_AXIS)

        fn = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P()) + (P(SHARD_AXIS),) * 4,
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def _build_search_map(self, qn: int, k: int, nprobe: int):
        seg, msegs, K = self.seg_size, self.packed.max_segs, self.n_lists
        chunk, impl = self.chunk, self.impl
        m_pq, ksub, dsub = self.pq.m, self.pq.ksub, self.pq.dsub

        def local(q, rot, c, pqc, data, row_ids, seg_valid, list_segs):
            data, row_ids = data[0], row_ids[0]
            seg_valid, list_segs = seg_valid[0], list_segs[0]

            qr = jnp.dot(q, rot, preferred_element_type=jnp.float32)

            # 1) probe in bf16, then exact f32 bias for the chosen lists
            _, probes = streaming_topk(
                qr.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                jnp.int32(K), nprobe, chunk=chunk, impl=impl,
            )  # [Q, P]
            c_sel = jnp.take(c, probes.reshape(-1), axis=0).reshape(qn, nprobe, -1)
            bias = jnp.einsum("qpd,qd->qp", c_sel, qr,
                              preferred_element_type=jnp.float32)

            # 2) shared residual LUTs: [Q, M, ksub] in one MXU einsum
            luts = jnp.einsum(
                "qmd,mkd->qmk", qr.reshape(qn, m_pq, dsub), pqc,
                preferred_element_type=jnp.float32,
            )

            row_iota = lax.broadcasted_iota(jnp.int32, (1, seg), 1)
            code_offsets = (jnp.arange(m_pq, dtype=jnp.int32) * ksub)[None, :]

            def per_query(args):
                qb, pl, lut = args            # [P] bias, [P] probes, [M, ksub]
                segs = jnp.take(list_segs, pl, axis=0)          # [P, msegs]
                owned = segs >= 0
                segc = jnp.where(owned, segs, 0)
                rows = segc.reshape(-1)[:, None] * seg + row_iota   # [P*msegs, seg]
                flat_rows = rows.reshape(-1)
                codes = jnp.take(data, flat_rows, axis=0).astype(jnp.int32)  # [R, M]
                adc = jnp.take(lut.reshape(-1), codes + code_offsets)        # [R, M]
                scores = jnp.sum(adc, axis=-1).reshape(-1, seg)              # [P*msegs, seg]
                scores = scores + jnp.repeat(qb, msegs)[:, None]             # + q.c_list

                live = owned.reshape(-1)[:, None] & (
                    row_iota < jnp.take(seg_valid, segc.reshape(-1))[:, None]
                )
                flat = jnp.where(live, scores, NEG_INF).reshape(-1)
                if flat.shape[0] < k:
                    flat = jnp.pad(flat, (0, k - flat.shape[0]), constant_values=NEG_INF)
                v, idx = lax.top_k(flat, k)
                lookup = flat_rows
                if lookup.shape[0] < k:
                    lookup = jnp.pad(lookup, (0, k - lookup.shape[0]))
                pos = jnp.take(row_ids, lookup[idx])
                pos = jnp.where(v > NEG_INF, pos, -1)
                return v, pos

            v, pos = lax.map(per_query, (bias, probes, luts))
            return merge_topk_all_gather(v, pos, k, SHARD_AXIS)

        fn = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P()) + (P(SHARD_AXIS),) * 4,
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    # -- host-resident-lists search (the ondisk.ivfdata analog) -------------------

    def _build_host_probe(self, qn: int, nprobe: int):
        chunk, impl, K = self.chunk, self.impl, self.n_lists
        m_pq, ksub, dsub = self.pq.m, self.pq.ksub, self.pq.dsub

        def probe(q, rot, c, pqc):
            qr = jnp.dot(q, rot, preferred_element_type=jnp.float32)
            _, probes = streaming_topk(
                qr.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                jnp.int32(K), nprobe, chunk=chunk, impl=impl,
            )
            c_sel = jnp.take(c, probes.reshape(-1), axis=0).reshape(qn, nprobe, -1)
            bias = jnp.einsum("qpd,qd->qp", c_sel, qr,
                              preferred_element_type=jnp.float32)
            luts = jnp.einsum(
                "qmd,mkd->qmk", qr.reshape(qn, m_pq, dsub), pqc,
                preferred_element_type=jnp.float32,
            )
            return probes, bias, luts

        return jax.jit(probe)

    def _build_host_rank(self, qn: int, k: int, slots_per_q: int):
        seg = self.seg_size

        from ..ops.adc import adc_scan_pallas

        def rank(codes3, luts, slot_bias, live):
            n_slots = qn * slots_per_q
            seg_ids = jnp.arange(n_slots, dtype=jnp.int32)  # gathered tiles, in order
            scores = adc_scan_pallas(codes3, luts, seg_ids)
            scores = scores + slot_bias[:, None]
            flat = jnp.where(live, scores, NEG_INF).reshape(qn, -1)
            if flat.shape[1] < k:
                flat = jnp.pad(flat, ((0, 0), (0, k - flat.shape[1])),
                               constant_values=NEG_INF)
            return lax.top_k(flat, k)

        return jax.jit(rank)

    def _search_host(self, q: np.ndarray, k: int, nprobe: int):
        qn = q.shape[0]
        msegs = self.packed.max_segs
        key = ("hp", qn, nprobe)
        if key not in self._search_cache:
            self._search_cache[key] = self._build_host_probe(qn, nprobe)
        probes, bias, luts = self._search_cache[key](
            jnp.asarray(q), self._rot_dev, self._centroids_dev, self._pq_cent_dev
        )
        probes = np.asarray(probes)

        # host gather of exactly the probed segments
        segs = self._host_list_segs[probes]                      # [Q, P, msegs]
        seg_flat = segs.reshape(-1)
        owned = seg_flat >= 0
        segc = np.where(owned, seg_flat, 0)
        codes3 = self._host_codes3[segc]                         # [n_slots, SEG, M]
        row_iota = np.arange(self.seg_size, dtype=np.int32)[None, :]
        live = owned[:, None] & (row_iota < self._host_seg_valid[segc][:, None])
        slot_bias = np.repeat(np.asarray(bias).reshape(-1), msegs)

        key2 = ("hr", qn, k, nprobe * msegs)
        if key2 not in self._search_cache:
            self._search_cache[key2] = self._build_host_rank(qn, k, nprobe * msegs)
        v, idx = self._search_cache[key2](
            jnp.asarray(codes3), luts, jnp.asarray(slot_bias), jnp.asarray(live)
        )
        v, idx = np.asarray(v), np.asarray(idx)

        # map flat (slot, row) candidates back to corpus positions
        rows = (segc[:, None] * self.seg_size + row_iota).reshape(qn, -1)
        if rows.shape[1] < k:
            rows = np.pad(rows, ((0, 0), (0, k - rows.shape[1])))
        chosen = np.take_along_axis(rows, idx, axis=1)
        pos = self._host_row_ids[chosen].astype(np.int64)
        pos[v == NEG_INF] = -1
        return v, pos

    def search(self, queries: np.ndarray, k: int, *, nprobe: int = 8):
        if self.packed is None:
            raise RuntimeError("fill() before search()")
        q = np.asarray(queries, np.float32)
        if self.spherical:
            q = _normalize_rows(q)
        nprobe = min(nprobe, self.n_lists)
        if self.storage == "host":
            return self._search_host(q, k, nprobe)
        key = (q.shape[0], k, nprobe)
        if key not in self._search_cache:
            self._search_cache[key] = self._build_search(*key)
        v, pos = self._search_cache[key](
            jnp.asarray(q), self._rot_dev, self._centroids_dev, self._pq_cent_dev,
            *self._dev_arrays,
        )
        return np.asarray(v), np.asarray(pos, np.int64)

    # -- artifacts --------------------------------------------------------------------

    def save(self, directory: str | Path, *, include_lists: bool = True) -> None:
        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        np.save(d / "centroids.npy", self.kmeans.centroids)
        np.save(d / "pq_centroids.npy", self.pq.centroids)
        np.save(d / "rotation.npy", self.rotation)
        meta = {
            "type": "ivf_pq",
            "n_lists": self.n_lists,
            "dim": self.dim,
            "pq_m": self.pq.m,
            "pq_nbits": self.pq.nbits,
            "use_opq": self.use_opq,
            "seg_size": self.seg_size,
            "spherical": self.spherical,
            "n": self.n,
            "train_stats": _json_safe(self.train_stats),
        }
        (d / "meta.json").write_text(json.dumps(meta, indent=2))
        if include_lists and self.packed is not None:
            data, row_ids, seg_valid, list_segs = self.packed.stacked()
            np.savez_compressed(
                d / "lists.npz",
                data=data, row_ids=row_ids, seg_valid=seg_valid, list_segs=list_segs,
                seg_size=self.seg_size, n_rows=self.packed.n_rows,
                max_segs=self.packed.max_segs,
            )

    @classmethod
    def load(cls, directory: str | Path, *, mesh=None, **kw) -> "IVFPQIndex":
        d = Path(directory)
        meta = json.loads((d / "meta.json").read_text())
        idx = cls(
            meta["n_lists"], meta["dim"], pq_m=meta["pq_m"], pq_nbits=meta["pq_nbits"],
            use_opq=meta["use_opq"], mesh=mesh, seg_size=meta["seg_size"],
            spherical=meta["spherical"], **kw,
        )
        idx.kmeans.centroids = np.load(d / "centroids.npy")
        idx.pq.centroids = np.load(d / "pq_centroids.npy")
        idx.rotation = np.load(d / "rotation.npy")
        if idx.opq is not None:
            idx.opq.rotation = idx.rotation
            idx.opq.pq.centroids = idx.pq.centroids
        idx.train_stats = meta.get("train_stats", {})
        lists_file = d / "lists.npz"
        if lists_file.exists():
            z = np.load(lists_file)
            from .lists import DeviceLists

            ndev_saved = z["data"].shape[0]
            want = idx.ndev if idx.storage == "device" else 1
            if ndev_saved != want:
                raise ValueError(
                    f"saved for {ndev_saved} shards, need {want} "
                    f"({idx.storage} storage); refill needed"
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


def _json_safe(obj):
    if isinstance(obj, dict):
        return {k: _json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_json_safe(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj
