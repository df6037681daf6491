"""Incremental (delta) fill: quarterly sync at O(new/updated rows).

The reference re-fills all ~207M rows every sync (Makefile:23-25 after
an rm-rf dump). Here `target_fill(incremental=True)` streams only rows
whose store revision is past the last fill's watermark into a
self-contained delta sub-index; the engine searches base + deltas and
merges newest-wins so UPDATED works serve their new embeddings while
the stale base hits are masked by id. A full fill compacts.
"""

import json

import numpy as np
import pytest

from abstracts_search_tpu.config import Config
from abstracts_search_tpu.driver import Driver
from abstracts_search_tpu.models.registry import HashEmbedder
from abstracts_search_tpu.storage.sqlite_store import EmbeddingStore, init_store

DIM = 32


@pytest.fixture()
def env(tmp_path):
    (tmp_path / "events").mkdir()
    cfg = Config(
        data_dir=str(tmp_path / "emb" / "data"),
        index_dir=str(tmp_path / "index"),
        store_path=str(tmp_path / "data.sqlite"),
        events_dir=str(tmp_path / "events"),
        ivf_centroids=8, train_sample=1500, tune_sample=400,
        pq_m=16, pq_nbits=4, embed_dim=DIM, model_name="hash-test",
    )
    emb = HashEmbedder(DIM)
    store = init_store(cfg.store_path)
    store.bump_rev()
    ids = [f"W{i:05d}" for i in range(1500)]
    docs = [f"base doc {i}" for i in range(1500)]
    store.upsert(ids, emb(docs))
    store.close()
    return cfg, emb


def _engine(cfg):
    from abstracts_search_tpu.serve.engine import SearchEngine

    return SearchEngine.from_artifacts(
        cfg, index_dir=cfg.index_dir, embedder="hash", hydrate=False,
        warmup=False)


def test_store_rev_watermark(tmp_path):
    store = init_store(tmp_path / "s.sqlite")
    assert store.sync_rev == 0
    store.bump_rev()
    store.upsert(["a"], np.ones((1, 4), np.float32))
    store.bump_rev()
    store.upsert(["b"], np.ones((1, 4), np.float32))
    store.upsert(["a"], 2 * np.ones((1, 4), np.float32))  # update re-stamps
    assert store.count_since(1) == 2
    assert store.count_since(2) == 0
    got = list(store.iter_batches(min_rev=2))
    assert [i for ids, _ in got for i in ids] == ["a", "b"]
    store.close()


def test_incremental_fill_and_merged_search(env):
    cfg, emb = env
    drv = Driver(cfg)
    drv.target_dump()
    drv.target_fill()
    base_stamp = json.loads(drv.fill_stamp.read_text())
    assert base_stamp["watermark"] == 1

    # quarterly sync: 60 NEW works + 40 UPDATED works (new abstracts)
    store = EmbeddingStore(cfg.store_path)
    store.bump_rev()
    new_ids = [f"W9{i:04d}" for i in range(60)]
    store.upsert(new_ids, emb([f"new doc {i}" for i in range(60)]))
    upd_ids = [f"W{i:05d}" for i in range(40)]
    store.upsert(upd_ids, emb([f"updated doc {i}" for i in range(40)]))
    store.close()
    drv.target_dump(force=True)

    assert drv.target_fill(incremental=True) is True
    assert len(drv.delta_dirs()) == 1
    dstamp = json.loads((drv.delta_dirs()[0] / "stamp.json").read_text())
    assert dstamp["rows"] == 100
    assert json.loads(drv.fill_stamp.read_text())["watermark"] == 2

    eng = _engine(cfg)
    assert len(eng.deltas) == 1

    # a NEW work is findable
    hits = eng.search("new doc 7", k=5)
    assert hits[0]["id"] == "W90007"
    assert hits[0]["score"] > 0.8

    # an UPDATED work: its NEW text finds it, its id appears ONCE
    hits = eng.search("updated doc 3", k=10)
    assert hits[0]["id"] == "W00003"
    assert [h["id"] for h in hits].count("W00003") == 1

    # the stale base vector must NOT serve: searching the OLD text must
    # not surface the id from the base index with a near-1 score
    hits = eng.search("base doc 3", k=10)
    stale = [h for h in hits if h["id"] == "W00003"]
    assert all(h["score"] < 0.9 for h in stale)

    # an untouched base work is unaffected
    hits = eng.search("base doc 777", k=5)
    assert hits[0]["id"] == "W00777"

    # idempotence: nothing past the watermark -> no new delta
    assert drv.target_fill(incremental=True) is False
    assert len(drv.delta_dirs()) == 1


def test_second_delta_and_compaction(env):
    cfg, emb = env
    drv = Driver(cfg)
    drv.target_dump()
    drv.target_fill()

    for rnd in (1, 2):
        store = EmbeddingStore(cfg.store_path)
        store.bump_rev()
        store.upsert([f"R{rnd}X{i:03d}" for i in range(30)],
                     emb([f"round {rnd} doc {i}" for i in range(30)]))
        # round 2 also re-updates a round-1 row: newest delta must win
        if rnd == 2:
            store.upsert(["R1X005"], emb(["moved in round 2"]))
        store.close()
        drv.target_dump(force=True)
        assert drv.target_fill(incremental=True) is True
    assert len(drv.delta_dirs()) == 2

    eng = _engine(cfg)
    hits = eng.search("round 1 doc 9", k=5)
    assert hits[0]["id"] == "R1X009"
    hits = eng.search("moved in round 2", k=5)
    assert hits[0]["id"] == "R1X005"
    # the round-1 copy of R1X005 is superseded by the round-2 delta
    hits = eng.search("round 1 doc 5", k=10)
    stale = [h for h in hits if h["id"] == "R1X005"]
    assert all(h["score"] < 0.9 for h in stale)

    # compaction: a forced full fill folds everything and drops deltas
    assert drv.target_fill(force=True) is True
    assert drv.delta_dirs() == []
    eng2 = _engine(cfg)
    assert eng2.deltas == []
    assert eng2.search("moved in round 2", k=5)[0]["id"] == "R1X005"
    assert eng2.search("round 2 doc 11", k=5)[0]["id"] == "R2X011"


def test_auto_compaction_policy(env):
    """VERDICT r3 next #2: a sync loop that accumulates deltas past the
    policy threshold must trigger automatic compaction, restoring
    single-index serving with identical results."""
    import dataclasses

    cfg, emb = env
    # tight policy: compact once there are more than 2 deltas OR the
    # delta rows exceed 4% of the base (1500 rows -> 60)
    cfg = dataclasses.replace(cfg, compact_max_deltas=2,
                              compact_max_delta_frac=0.04)
    drv = Driver(cfg)
    drv.target_dump()
    drv.target_fill()

    compacted_at = None
    for rnd in range(1, 5):
        store = EmbeddingStore(cfg.store_path)
        store.bump_rev()
        store.upsert([f"S{rnd}X{i:03d}" for i in range(25)],
                     emb([f"sync {rnd} doc {i}" for i in range(25)]))
        store.close()
        assert drv.target_fill(incremental=True) is True
        if not drv.delta_dirs():
            compacted_at = rnd
            break
    # 25 rows/sync: count trips the >2-deltas rule on sync 3 (75 rows
    # also crosses 4% of 1500 = 60 — either rule suffices)
    assert compacted_at == 3, compacted_at
    assert drv.delta_dirs() == []
    # watermark advanced to the compaction dump's revision: nothing pending
    assert drv.target_fill(incremental=True) is False
    assert drv.delta_dirs() == []

    # single-index serving, identical results to a from-scratch engine
    eng = _engine(cfg)
    assert eng.deltas == []
    for rnd in (1, 2, 3):
        hits = eng.search(f"sync {rnd} doc 7", k=5)
        assert hits[0]["id"] == f"S{rnd}X007", (rnd, hits)
    assert eng.search("base doc 42", k=5)[0]["id"] == "W00042"

    # explicit no-op path
    assert drv.target_compact() is False


def test_compact_cli_and_disabled_autocompact(env):
    """auto_compact=False defers to the explicit `astpu index compact`
    entry point; the engine keeps warning but serving stays correct."""
    import dataclasses

    cfg, emb = env
    cfg = dataclasses.replace(cfg, compact_max_deltas=1, auto_compact=False)
    drv = Driver(cfg)
    drv.target_dump()
    drv.target_fill()
    for rnd in (1, 2):
        store = EmbeddingStore(cfg.store_path)
        store.bump_rev()
        store.upsert([f"T{rnd}X{i:03d}" for i in range(10)],
                     emb([f"batch {rnd} doc {i}" for i in range(10)]))
        store.close()
        assert drv.target_fill(incremental=True) is True
    assert len(drv.delta_dirs()) == 2          # policy fired but deferred
    assert drv.compaction_due() is True

    assert drv.target_compact() is True
    assert drv.delta_dirs() == []
    eng = _engine(cfg)
    assert eng.deltas == []
    assert eng.search("batch 2 doc 3", k=5)[0]["id"] == "T2X003"


def test_incremental_without_redump_sees_store_rows(env):
    """`astpu build && index fill --incremental` (no dump in between)
    must index the new store rows — the delta streams from the store,
    and the dump-fingerprint no-op must not short-circuit it."""
    cfg, emb = env
    drv = Driver(cfg)
    drv.target_dump()
    drv.target_fill()

    store = EmbeddingStore(cfg.store_path)
    store.bump_rev()
    store.upsert(["FRESH001"], emb(["fresh undumped doc"]))
    store.close()
    # NO dump here
    assert drv.target_fill(incremental=True) is True
    eng = _engine(cfg)
    assert eng.search("fresh undumped doc", k=3)[0]["id"] == "FRESH001"


def test_full_fill_watermark_is_dump_time_not_live(env):
    """Rows upserted AFTER the dump must stay past the watermark a
    full fill records — stamping the live store counter would orphan
    them from every future incremental fill (silent data loss)."""
    cfg, emb = env
    drv = Driver(cfg)
    drv.target_dump()

    # upsert AFTER the dump, BEFORE the full fill
    store = EmbeddingStore(cfg.store_path)
    store.bump_rev()
    store.upsert(["LATE0001"], emb(["late arriving doc"]))
    store.close()

    drv.target_fill()           # fills the (stale) dump
    # the late row must be recoverable incrementally
    assert drv.target_fill(incremental=True) is True
    eng = _engine(cfg)
    assert eng.search("late arriving doc", k=3)[0]["id"] == "LATE0001"
