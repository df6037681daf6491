"""Distributed k-means — the IVF coarse quantizer trainer.

Replaces faiss `Clustering` behind `sidecar-search index train -N -c
65536` (SURVEY.md §2 #7; reference Makefile:37-39, README.md:60):
spherical k-means (`-N` = vectors and centroids on the unit sphere,
assignment by max inner product) over a training subset (~10M rows at
production scale).

TPU mapping (SURVEY.md §5 "distributed communication backend"):
- training rows are sharded over the mesh's ``shard`` axis,
- assignment is the fused streaming top-k kernel with k=1
  (ops/topk.py — tiled [B, K] distance matmul with a running argmax,
  never materializing B x 65536 scores),
- per-device centroid sums/counts via one-hot matmuls on the MXU
  (segment-scatter is the one thing TPUs hate), reduced with `psum`
  over ICI,
- centroid update + empty-cluster splitting happen host-side per
  iteration (K x D is tiny next to the data).
"""

from __future__ import annotations

import logging
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.topk import streaming_topk
from ..parallel.mesh import SHARD_AXIS, build_mesh, global_put

logger = logging.getLogger(__name__)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(n, 1e-12)


def _l2_augment(x, c):
    """Bias augmentation making max-IP selection equal min-L2:
    ``argmin_j ||x - c_j||^2 == argmax_j (x . c_j - ||c_j||^2 / 2)``.

    Appends a ones column to ``x`` and a ``-||c||^2/2`` column to ``c``
    (both zero-padded to a 128-column multiple so Pallas contractions
    stay lane-aligned), which routes plain-L2 assignment through the
    SAME streaming top-k kernel as the spherical path — the `-N`-absent
    mode of the reference TRAINFLAGS contract (round-4 VERDICT weak #6;
    reference README.md:60). Returned scores are
    ``x.c - ||c||^2/2 = (||x||^2 - ||x - c||^2)/2`` — per-row monotone
    in negative distance."""
    d = x.shape[-1]
    pad = _round_up(d + 1, 128) - d
    xa = jnp.concatenate(
        [x, jnp.ones(x.shape[:-1] + (1,), x.dtype),
         jnp.zeros(x.shape[:-1] + (pad - 1,), x.dtype)], axis=-1)
    cf = c.astype(jnp.float32)
    bias = -0.5 * jnp.sum(jnp.square(cf), axis=-1, keepdims=True)
    ca = jnp.concatenate(
        [cf, bias, jnp.zeros((c.shape[0], pad - 1), jnp.float32)], axis=-1)
    return xa, ca


def _assign_operands(x, c, spherical):
    """Operands for the streaming_topk assignment/probe matmul — the
    ONE place the metric-mode dtype invariant lives (round-5 review:
    it was copy-pasted at four call sites).

    Spherical rides bf16: unit-norm scores in [-1, 1] keep the
    quantization step ~2^-9, and halving the operand bytes halves the
    kernel's VMEM blocks / doubles scan bandwidth. Plain-L2 augments
    (``_l2_augment``) and MUST stay f32: the appended ``-||c||^2/2``
    bias has magnitude ~||c||^2/2, so a bf16 step (~magnitude/256) can
    exceed inter-centroid score gaps on high-norm data and silently
    corrupt assignments; streaming_topk requests HIGHEST matmul
    precision for f32 operands so XLA:TPU cannot re-downgrade them."""
    if spherical:
        return x.astype(jnp.bfloat16), c.astype(jnp.bfloat16)
    xa, ca = _l2_augment(x, c)
    return xa.astype(jnp.float32), ca.astype(jnp.float32)


class KMeans:
    """Spherical (``-N``) or plain-L2 k-means over a device mesh.

    ``spherical=False`` is true Lloyd's-L2: assignment runs
    argmax(x.c - ||c||^2/2) == argmin ||x - c||^2 through the same
    streaming top-k kernel via :func:`_l2_augment` (round-4 VERDICT
    weak #6), and centroid updates are unnormalized means. The reported
    per-iteration ``objective`` is then the mean biased score
    ``(||x||^2 - ||x - c||^2)/2`` — monotone in the (negated) k-means
    MSE since ``mean ||x||^2`` is constant across iterations."""

    # bytes per device for staged training data; samples above this
    # stream from their source (host RAM or memmap) every iteration
    DEVICE_BUDGET_BYTES = 4 << 30

    def __init__(
        self,
        k: int,
        *,
        mesh=None,
        spherical: bool = True,
        chunk: int = 1024,
        onehot_chunk: int = 8192,
        impl: str = "auto",
        seed: int = 0,
    ):
        self.k = k
        self.mesh = mesh if mesh is not None else build_mesh()
        self.spherical = spherical
        self.chunk = chunk
        self.onehot_chunk = min(onehot_chunk, _round_up(k, 128))
        self.impl = impl
        self.seed = seed
        self.centroids: np.ndarray | None = None
        self.stats: dict = {}
        self._step_fn = None
        self._assign_fn = None

    @property
    def ndev(self) -> int:
        return self.mesh.shape[SHARD_AXIS]

    # -- jitted SPMD step -------------------------------------------------------

    def _build_step(self, rows_per_dev: int, dim: int):
        k_pad = _round_up(self.k, self.chunk)
        chunk, impl, k = self.chunk, self.impl, self.k
        oc = self.onehot_chunk
        spherical = self.spherical

        def local_step(x, valid, c):
            # x: [rows_per_dev, D], valid: [rows_per_dev, 1] f32,
            # c: [k_pad, D] (padded centroids, rows >= k are garbage)
            # bf16 spherical / f32 bias-augmented L2 — see _assign_operands
            xq, cq = _assign_operands(x, c, spherical)
            v, idx = streaming_topk(
                xq, cq, jnp.int32(k), 1, chunk=chunk, impl=impl,
            )
            a = idx[:, 0]                                  # [b]
            score = v[:, 0] * valid[:, 0]

            # one-hot matmul accumulation, chunked over centroids
            xf = x.astype(jnp.float32) * valid             # zero padded rows
            n_oc = k_pad // oc

            def body(i, carry):
                sums, counts = carry
                base = i * oc
                onehot = (
                    (a[:, None] - base) == lax.broadcasted_iota(jnp.int32, (1, oc), 1)
                ).astype(jnp.float32) * valid              # [b, oc]
                # L2 mode keeps the UPDATE half of Lloyd exact too:
                # default precision would bf16-round xf inside the sum
                # matmul on TPU (round-5 review). Spherical keeps the
                # fast default — unit-norm data, recall chip-verified.
                part = jnp.dot(
                    onehot.T, xf, preferred_element_type=jnp.float32,
                    precision=None if spherical else lax.Precision.HIGHEST)
                cnt = jnp.sum(onehot, axis=0)
                sums = lax.dynamic_update_slice_in_dim(sums, part, base, axis=0)
                counts = lax.dynamic_update_slice_in_dim(counts, cnt, base, axis=0)
                return sums, counts

            sums = jnp.zeros((k_pad, dim), jnp.float32)
            counts = jnp.zeros((k_pad,), jnp.float32)
            sums, counts = lax.fori_loop(0, n_oc, body, (sums, counts))

            sums = lax.psum(sums, SHARD_AXIS)
            counts = lax.psum(counts, SHARD_AXIS)
            obj = lax.psum(jnp.sum(score), SHARD_AXIS)
            return sums[: self.k], counts[: self.k], obj

        fn = shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def _build_step_acc(self, rows_per_dev: int, dim: int):
        """Chunk step with DEVICE-RESIDENT accumulators: like _build_step
        but folds this chunk's psum'd partial sums into carried
        (sums, counts, obj) replicas. The device-streamed fit
        (_fit_device_stream) chains one call per chunk with no host sync;
        only [k] counts and two scalars cross the link per Lloyd
        iteration (the dev tunnel is ~22 MiB/s: downloading [K, D]
        partials per chunk would cost minutes per iteration at
        K=65,536)."""
        k_pad = _round_up(self.k, self.chunk)
        chunk, impl, k = self.chunk, self.impl, self.k
        oc = self.onehot_chunk
        spherical = self.spherical

        def local_step(x, valid, c, sums_in, counts_in, obj_in):
            xq, cq = _assign_operands(x, c, spherical)
            v, idx = streaming_topk(
                xq, cq, jnp.int32(k), 1, chunk=chunk, impl=impl,
            )
            a = idx[:, 0]
            score = v[:, 0] * valid[:, 0]
            xf = x.astype(jnp.float32) * valid
            n_oc = k_pad // oc

            def body(i, carry):
                sums, counts = carry
                base = i * oc
                onehot = (
                    (a[:, None] - base) == lax.broadcasted_iota(jnp.int32, (1, oc), 1)
                ).astype(jnp.float32) * valid
                # L2 mode keeps the UPDATE half of Lloyd exact too:
                # default precision would bf16-round xf inside the sum
                # matmul on TPU (round-5 review). Spherical keeps the
                # fast default — unit-norm data, recall chip-verified.
                part = jnp.dot(
                    onehot.T, xf, preferred_element_type=jnp.float32,
                    precision=None if spherical else lax.Precision.HIGHEST)
                cnt = jnp.sum(onehot, axis=0)
                sums = lax.dynamic_update_slice_in_dim(sums, part, base, axis=0)
                counts = lax.dynamic_update_slice_in_dim(counts, cnt, base, axis=0)
                return sums, counts

            sums = jnp.zeros((k_pad, dim), jnp.float32)
            counts = jnp.zeros((k_pad,), jnp.float32)
            sums, counts = lax.fori_loop(0, n_oc, body, (sums, counts))

            sums = lax.psum(sums[: self.k], SHARD_AXIS)
            counts = lax.psum(counts[: self.k], SHARD_AXIS)
            obj = lax.psum(jnp.sum(score), SHARD_AXIS)
            return sums_in + sums, counts_in + counts, obj_in + obj

        fn = shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(3, 4, 5))

    def _build_update(self, dim: int):
        """Device-side Lloyd update + empty-split application: consumes
        the accumulated (sums, counts) and the CURRENT padded centroids,
        returns the next padded centroids and the convergence delta —
        centroids stay device-resident across iterations (at K=65,536
        a [K, D] round trip is ~2x268 MB through the link per
        iteration)."""
        k, k_pad = self.k, _round_up(self.k, self.chunk)
        spherical = self.spherical

        def _norm(c):
            return c / jnp.maximum(
                jnp.linalg.norm(c, axis=1, keepdims=True), 1e-12)

        def upd(c_pad, sums, counts, e_dst, e_src, eps):
            c = c_pad[:k]
            new_c = jnp.where(
                counts[:, None] > 0,
                sums / jnp.maximum(counts[:, None], 1.0), c)
            if spherical:
                new_c = _norm(new_c)
            # empty-cluster repair (host picked (dst, src) from counts;
            # padding slots carry dst=k and are dropped)
            repl = jnp.take(new_c, e_src, axis=0, mode="clip") + eps
            new_c = new_c.at[e_dst].set(repl, mode="drop")
            if spherical:
                new_c = _norm(new_c)
            delta = jnp.linalg.norm(new_c - c) / np.sqrt(k)
            out = lax.dynamic_update_slice_in_dim(
                jnp.zeros((k_pad, dim), jnp.float32), new_c, 0, axis=0)
            return out, delta

        return jax.jit(upd, donate_argnums=(0, 1))

    # fixed empty-split slab size: keeps the update jit monomorphic
    # (a per-iteration empty count would recompile every iteration)
    SPLIT_SLAB = 4096

    def _fit_device_stream(self, src, *, iters: int, tol: float) -> np.ndarray:
        """Lloyd iterations over a chunked DEVICE source (the virtual
        corpus / a device-prefetching reader, storage/virtual.py):
        chunks are (re)generated or (re)staged on device every
        iteration, accumulators and centroids live on device, and the
        host sees only [k] counts + 2 scalars per iteration. This is
        the production `-c 65536` x 10M-row training path
        (reference README.md:60) on rigs where the sample cannot be
        re-uploaded per iteration."""
        from ..parallel.mesh import global_put

        n = len(src)
        dim = src.shape[1]
        ch = src.chunk_rows
        if n < self.k:
            raise ValueError(f"need >= k={self.k} training rows, got {n}")
        if ch % (8 * self.ndev) != 0:
            raise ValueError(
                f"chunk_rows={ch} must be a multiple of 8*ndev={8 * self.ndev}")
        norm = self.spherical and not getattr(src, "prenormalized", False)

        rng = np.random.default_rng(self.seed)
        init_idx = np.sort(rng.choice(n, size=self.k, replace=False))
        init_rows = src.gather_rows(init_idx)
        if norm or self.spherical:
            init_rows = _normalize_rows(init_rows)
        self.centroids = init_rows  # host mirror, refreshed at the end

        per = ch // self.ndev
        step = self._build_step_acc(per, dim)
        upd = self._build_update(dim)
        k_pad = _round_up(self.k, self.chunk)
        zeros = jax.jit(
            lambda: (jnp.zeros((self.k, dim), jnp.float32),
                     jnp.zeros((self.k,), jnp.float32),
                     jnp.zeros((), jnp.float32)),
            out_shardings=(NamedSharding(self.mesh, P()),) * 3)
        vj = global_put(np.ones((ch, 1), np.float32), self.mesh, P(SHARD_AXIS))
        c_pad = global_put(self._centroids_padded(), self.mesh, P())

        objective_hist = []
        split_hist = []
        for it in range(iters):
            sums, counts, obj = zeros()
            for j in range(src.num_chunks):
                x = src.device_chunk(j)
                sums, counts, obj = step(x, vj, c_pad, sums, counts, obj)
            counts_h = np.asarray(counts, np.float64)

            # host picks empty-split (dst, src) pairs from counts alone
            empty = np.flatnonzero(counts_h == 0)[: self.SPLIT_SLAB]
            order = np.argsort(-counts_h)
            S = self.SPLIT_SLAB
            e_dst = np.full(S, self.k, np.int32)          # k => dropped
            e_src = np.zeros(S, np.int32)
            eps = np.zeros((S, dim), np.float32)
            for j, e in enumerate(empty):
                e_dst[j] = e
                e_src[j] = order[j % max(1, len(order))]
            if len(empty):
                # scale-aware jitter (see _split_empty): fetch just the
                # source centroid rows to size it — spherical rows are
                # unit-norm, plain-L2 rows are not
                if self.spherical:
                    scales = np.full(len(empty), 0.1 + 1e-3, np.float32)
                else:
                    src_rows = np.asarray(jnp.take(
                        c_pad, jnp.asarray(e_src[: len(empty)]), axis=0))
                    scales = (0.1 * np.linalg.norm(src_rows, axis=1)
                              + 1e-3).astype(np.float32)
                for j in range(len(empty)):
                    eps[j] = scales[j] * rng.standard_normal(dim).astype(
                        np.float32)
            split_hist.append(int(len(empty)))

            c_pad, delta = upd(c_pad, sums, counts,
                               jnp.asarray(e_dst), jnp.asarray(e_src),
                               jnp.asarray(eps))
            mean_obj = float(obj) / n
            objective_hist.append(mean_obj)
            delta = float(delta)
            logger.info(
                "kmeans iter %d: objective=%.6f empties_split=%d delta=%.2e "
                "(device-streamed, %d chunks)",
                it, mean_obj, split_hist[-1], delta, src.num_chunks,
            )
            if delta < tol:
                break

        self.centroids = np.asarray(c_pad, np.float32)[: self.k]
        self.stats = {
            "k": self.k,
            "n_train": int(n),
            "iters_run": len(objective_hist),
            "objective": objective_hist,
            "empty_splits": split_hist,
            "spherical": self.spherical,
            "mode": "device_stream",
        }
        return self.centroids

    def _build_assign(self, rows_per_dev: int):
        chunk, impl, k = self.chunk, self.impl, self.k
        spherical = self.spherical
        # multi-controller: np.asarray on the caller side can only read
        # process-local shards, so replicate the (tiny: 12 B/row)
        # result via all_gather instead of returning row-sharded
        replicate = jax.process_count() > 1

        def local(x, c):
            xq, cq = _assign_operands(x, c, spherical)
            v, idx = streaming_topk(
                xq, cq, jnp.int32(k), 1, chunk=chunk, impl=impl,
            )
            v, idx = v[:, 0], idx[:, 0]
            if replicate:
                v = lax.all_gather(v, SHARD_AXIS, tiled=True)
                idx = lax.all_gather(idx, SHARD_AXIS, tiled=True)
            return v, idx

        out = (P(), P()) if replicate else (P(SHARD_AXIS), P(SHARD_AXIS))
        fn = shard_map(
            local, mesh=self.mesh,
            in_specs=(P(SHARD_AXIS), P()),
            out_specs=out,
            check_vma=False,
        )
        return jax.jit(fn)

    # -- data plumbing ------------------------------------------------------------

    def _pad_batch(self, x: np.ndarray):
        """Pad rows to ndev*multiple-of-8 alignment; returns (x_pad, valid)."""
        n = x.shape[0]
        per = _round_up(_round_up(n, self.ndev) // self.ndev, 8)
        total = per * self.ndev
        if total != n:
            x = np.concatenate([x, np.zeros((total - n, x.shape[1]), x.dtype)], axis=0)
        valid = np.zeros((total, 1), np.float32)
        valid[:n] = 1.0
        return x, valid

    def _centroids_padded(self) -> np.ndarray:
        k_pad = _round_up(self.k, self.chunk)
        c = np.zeros((k_pad, self.centroids.shape[1]), np.float32)
        c[: self.k] = self.centroids
        # padding centroids must never win an argmax: give them a huge
        # negative bias by pointing them away is impossible in general,
        # so rely on streaming_topk's n_valid masking instead (k passed
        # as n_valid above).
        return c

    # -- API ------------------------------------------------------------------------

    def fit(
        self,
        data: np.ndarray | Iterable[np.ndarray],
        *,
        iters: int = 10,
        batch_rows: int = 1 << 18,
        tol: float = 1e-4,
        prenormalized: bool = False,
    ) -> np.ndarray:
        """Lloyd iterations over the training data.

        ``data``: an [N, D] array — possibly an np.memmap (the 10M-row
        production sample lives on disk, VERDICT.md round-1 missing #4:
        the reference trains on a 16 GB machine) — or an iterable of
        arrays. Data is consumed window-by-window: when the sample fits
        the per-device budget, windows are staged in HBM once; otherwise
        each Lloyd iteration re-reads the windows from their source
        (memmap reads ride the page cache), so host RSS stays
        O(batch_rows), never O(N). ``prenormalized`` skips the
        per-window normalize for callers that wrote unit rows already.
        """
        if hasattr(data, "device_chunk"):
            return self._fit_device_stream(data, iters=iters, tol=tol)
        sources = [data] if isinstance(data, np.ndarray) else list(data)
        n_total = sum(len(s) for s in sources)
        if n_total < self.k:
            raise ValueError(f"need >= k={self.k} training rows, got {n_total}")
        dim = sources[0].shape[1]
        norm = self.spherical and not prenormalized

        # init: random distinct rows (faiss-style random subset init),
        # gathered per source — NO concatenation of the sample
        rng = np.random.default_rng(self.seed)
        init_idx = np.sort(rng.choice(n_total, size=self.k, replace=False))
        bounds = np.cumsum([0] + [len(s) for s in sources])
        init_rows = np.empty((self.k, dim), np.float32)
        for si, s in enumerate(sources):
            sel = init_idx[(init_idx >= bounds[si]) & (init_idx < bounds[si + 1])]
            take = np.asarray(s[sel - bounds[si]], np.float32)
            init_rows[np.searchsorted(init_idx, sel)] = take
        self.centroids = _normalize_rows(init_rows) if self.spherical else init_rows

        # Pre-stage padded batches ON DEVICE when they fit — Lloyd re-reads
        # the same sample every iteration, and re-uploading it per iter
        # wastes host<->device bandwidth. Batches are row-sharded over the
        # mesh; when the sample exceeds the device budget we keep (source,
        # lo, hi) references and stream windows each iteration instead.
        from ..parallel.mesh import global_put

        on_device = n_total * dim * 4 <= self.DEVICE_BUDGET_BYTES * self.ndev

        def load_window(src, lo, hi):
            x = np.asarray(src[lo:hi], np.float32)
            return _normalize_rows(x) if norm else x

        staged = []
        steps: dict = {}
        for src, lo, hi in _windows(sources, batch_rows):
            per = _round_up(_round_up(hi - lo, self.ndev) // self.ndev, 8)
            if per not in steps:
                steps[per] = self._build_step(per, dim)
            if on_device:
                x, valid = self._pad_batch(load_window(src, lo, hi))
                staged.append((global_put(x, self.mesh, P(SHARD_AXIS)),
                               global_put(valid, self.mesh, P(SHARD_AXIS)),
                               steps[per]))
            else:
                staged.append(((src, lo, hi), None, steps[per]))

        objective_hist = []
        split_hist = []
        for it in range(iters):
            c_pad = jnp.asarray(self._centroids_padded())
            sums = np.zeros((self.k, dim), np.float64)
            counts = np.zeros((self.k,), np.float64)
            obj = 0.0
            for xj, vj, step_fn in staged:
                if vj is None:  # lazy window: re-read + pad this iteration
                    xj, vj = self._pad_batch(load_window(*xj))
                s, cnt, o = step_fn(jnp.asarray(xj), jnp.asarray(vj), c_pad)
                sums += np.asarray(s, np.float64)
                counts += np.asarray(cnt, np.float64)
                obj += float(o)

            new_c = np.where(
                counts[:, None] > 0, sums / np.maximum(counts[:, None], 1), self.centroids
            ).astype(np.float32)
            if self.spherical:
                new_c = _normalize_rows(new_c)

            n_split = self._split_empty(new_c, counts, rng)
            split_hist.append(n_split)

            mean_obj = obj / n_total
            objective_hist.append(mean_obj)
            delta = float(np.linalg.norm(new_c - self.centroids) / np.sqrt(self.k))
            self.centroids = new_c
            logger.info(
                "kmeans iter %d: objective=%.6f empties_split=%d delta=%.2e",
                it, mean_obj, n_split, delta,
            )
            if delta < tol:
                break

        self.stats = {
            "k": self.k,
            "n_train": int(n_total),
            "iters_run": len(objective_hist),
            "objective": objective_hist,
            "empty_splits": split_hist,
            "spherical": self.spherical,
        }
        return self.centroids

    def fit_staged(self, xj, valid, n_total: int, *, iters: int = 10,
                   tol: float = 1e-4) -> np.ndarray:
        """Lloyd iterations over an ALREADY device-resident sample.

        `xj` is a padded [total, D] array row-sharded over the mesh
        (rows past n_total are zero), `valid` its [total, 1] f32 mask.
        Used by the device-resident train path (ivfpq._train_big): the
        sample was rotated on device right after OPQ and never returns
        to the host — only init rows and per-iteration [k, D] centroid
        sums cross the link."""
        total, dim = xj.shape
        if n_total < self.k:
            raise ValueError(f"need >= k={self.k} training rows, got {n_total}")
        rng = np.random.default_rng(self.seed)
        init_idx = np.sort(rng.choice(n_total, size=self.k, replace=False))
        init_rows = np.asarray(
            jnp.take(xj, jnp.asarray(init_idx), axis=0), np.float32)
        self.centroids = _normalize_rows(init_rows) if self.spherical else init_rows

        per = total // self.ndev
        step_fn = self._build_step(per, dim)

        objective_hist = []
        split_hist = []
        for it in range(iters):
            c_pad = jnp.asarray(self._centroids_padded())
            s, cnt, o = step_fn(xj, valid, c_pad)
            sums = np.asarray(s, np.float64)
            counts = np.asarray(cnt, np.float64)
            obj = float(o)

            new_c = np.where(
                counts[:, None] > 0, sums / np.maximum(counts[:, None], 1), self.centroids
            ).astype(np.float32)
            if self.spherical:
                new_c = _normalize_rows(new_c)
            n_split = self._split_empty(new_c, counts, rng)
            split_hist.append(n_split)

            mean_obj = obj / n_total
            objective_hist.append(mean_obj)
            delta = float(np.linalg.norm(new_c - self.centroids) / np.sqrt(self.k))
            self.centroids = new_c
            logger.info(
                "kmeans iter %d: objective=%.6f empties_split=%d delta=%.2e",
                it, mean_obj, n_split, delta,
            )
            if delta < tol:
                break

        self.stats = {
            "k": self.k,
            "n_train": int(n_total),
            "iters_run": len(objective_hist),
            "objective": objective_hist,
            "empty_splits": split_hist,
            "spherical": self.spherical,
        }
        return self.centroids

    def _split_empty(self, centroids: np.ndarray, counts: np.ndarray, rng) -> int:
        """faiss-style repair: empty centroid <- jittered copy of a big one.

        The jitter scales with the source centroid's norm: assignment
        scores ride a bf16 matmul, so a fixed 1e-3 jitter is BELOW the
        score resolution once scores are large (e.g. plain-L2 data with
        norm ~30 has scores ~450, bf16 step ~2) — the split would never
        attract a single point and the repair loops forever."""
        empty = np.flatnonzero(counts == 0)
        if len(empty) == 0:
            return 0
        order = np.argsort(-counts)
        for j, e in enumerate(empty):
            src = order[j % max(1, len(order))]
            scale = 0.1 * float(np.linalg.norm(centroids[src])) + 1e-3
            eps = scale * rng.standard_normal(centroids.shape[1]).astype(np.float32)
            centroids[e] = centroids[src] + eps
            if self.spherical:
                centroids[e] /= max(np.linalg.norm(centroids[e]), 1e-12)
        return len(empty)

    def assign(self, x: np.ndarray, *, batch_rows: int = 1 << 18) -> tuple[np.ndarray, np.ndarray]:
        """Return (scores, centroid ids) for rows of x.

        Chunked: a 10M x 1024 training sample is ~40 GB f32 — it must
        stream through device memory, never land on it whole.
        """
        if self.centroids is None:
            raise RuntimeError("fit() first")
        x = np.asarray(x, np.float32)
        if self.spherical:
            x = _normalize_rows(x)
        # global_put: multi-controller meshes need per-host shard
        # materialization (plain device_put on one process)
        c = global_put(self._centroids_padded(), self.mesh)
        scores = np.empty(len(x), np.float32)
        assign = np.empty(len(x), np.int64)
        for lo in range(0, len(x), batch_rows):
            xc = x[lo : lo + batch_rows]
            xp, _ = self._pad_batch(xc)
            per = xp.shape[0] // self.ndev
            if self._assign_fn is None or self._assign_fn[0] != per:
                self._assign_fn = (per, self._build_assign(per))
            v, a = self._assign_fn[1](global_put(xp, self.mesh, P(SHARD_AXIS)), c)
            scores[lo : lo + len(xc)] = np.asarray(v)[: len(xc)]
            assign[lo : lo + len(xc)] = np.asarray(a)[: len(xc)]
        return scores, assign


def _windows(sources, batch_rows):
    """Yield (source, lo, hi) windows of ~batch_rows rows."""
    for s in sources:
        for lo in range(0, len(s), batch_rows):
            yield s, lo, min(lo + batch_rows, len(s))
