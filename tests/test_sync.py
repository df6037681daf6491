"""Manifest diffing + incremental partition sync (offline, file:// URLs).

Covers the reference's L4 orchestration semantics (SURVEY.md §3.1-3.2):
cmp-guarded manifest replacement, per-partition stamps, at-most-once
ingest, crash-then-rerun safety.
"""

import gzip
import json

import numpy as np
import pytest

from abstracts_search_tpu.ingest.manifest import (
    group_by_partition,
    parse_manifest,
    partition_of,
    update_manifest_file,
)
from abstracts_search_tpu.ingest.sync import SyncState, ingest_partition, sync
from abstracts_search_tpu.storage.sqlite_store import init_store

DIM = 8


def hash_embedder(texts):
    out = np.zeros((len(texts), DIM), dtype=np.float32)
    for i, t in enumerate(texts):
        r = np.random.default_rng(abs(hash(t)) % (2**32))
        out[i] = r.standard_normal(DIM)
    return out


def _work(i, date):
    return {
        "id": f"https://openalex.org/W{date}-{i}",
        "title": f"Paper {i}",
        "language": "en",
        "abstract_inverted_index": {"topic": [0], f"number{i}": [1]},
    }


def _make_partition(tmp_path, date, n_works, n_parts=2):
    urls = []
    per = n_works // n_parts
    for p in range(n_parts):
        path = tmp_path / f"updated_date={date}" / f"part_{p:03d}.gz"
        path.parent.mkdir(parents=True, exist_ok=True)
        lines = "\n".join(
            json.dumps(_work(p * per + i, date)) for i in range(per)
        ) + "\n"
        path.write_bytes(gzip.compress(lines.encode()))
        urls.append(path.as_uri())
    return urls


def test_parse_manifest_sorted():
    raw = json.dumps({"entries": [
        {"url": "s3://x/works/updated_date=2024-02-01/part_000.gz"},
        {"url": "s3://x/works/updated_date=2024-01-01/part_000.gz"},
    ]}).encode()
    urls = parse_manifest(raw)
    assert urls == sorted(urls)


def test_partition_grouping():
    urls = [
        "https://h/works/updated_date=2024-01-01/part_000.gz",
        "https://h/works/updated_date=2024-01-01/part_001.gz",
        "https://h/works/updated_date=2024-02-01/part_000.gz",
    ]
    g = group_by_partition(urls)
    assert set(g) == {"updated_date=2024-01-01", "updated_date=2024-02-01"}
    assert len(g["updated_date=2024-01-01"]) == 2
    assert partition_of("nope/part.gz") is None


def test_manifest_cmp_guard(tmp_path):
    f = tmp_path / "manifest.txt"
    assert update_manifest_file(f, ["a", "b"]) is True
    m1 = f.stat().st_mtime_ns
    assert update_manifest_file(f, ["a", "b"]) is False  # unchanged -> untouched
    assert f.stat().st_mtime_ns == m1
    assert update_manifest_file(f, ["a", "b", "c"]) is True


@pytest.mark.parametrize("native", [True, False])
def test_ingest_partition_end_to_end(tmp_path, native):
    urls = _make_partition(tmp_path, "2024-01-01", 20)
    store = init_store(tmp_path / "d.sqlite")
    n = ingest_partition(urls, hash_embedder, store, batch_size=7,
                         use_native_filter=native)
    assert n == 20
    assert len(store) == 20
    assert store.get("https://openalex.org/W2024-01-01-0") is not None


def test_sync_incremental(tmp_path):
    """Second sync run ingests only new partitions (stamps skip old ones)."""
    urls1 = _make_partition(tmp_path, "2024-01-01", 10)
    store = init_store(tmp_path / "d.sqlite")
    state = SyncState(tmp_path / "events")

    r1 = sync(urls1, state, hash_embedder, store)
    assert r1 == {"updated_date=2024-01-01": 10}
    assert state.completed() == ["updated_date=2024-01-01"]

    # re-run: nothing to do
    r2 = sync(urls1, state, hash_embedder, store)
    assert r2 == {}
    assert len(store) == 10

    # new partition appears -> only it is ingested
    urls2 = urls1 + _make_partition(tmp_path, "2024-04-01", 6)
    r3 = sync(urls2, state, hash_embedder, store)
    assert r3 == {"updated_date=2024-04-01": 6}
    assert len(store) == 16


def test_crashed_partition_restreams(tmp_path):
    """A failed partition leaves no stamp; the rerun upserts idempotently."""
    urls = _make_partition(tmp_path, "2024-01-01", 10)
    store = init_store(tmp_path / "d.sqlite")
    state = SyncState(tmp_path / "events")

    calls = {"n": 0}

    def flaky_embedder(texts):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid-partition")
        return hash_embedder(texts)

    with pytest.raises(RuntimeError):
        sync(urls, state, flaky_embedder, store, batch_size=4)
    assert state.completed() == []          # no stamp
    partial = len(store)
    assert 0 < partial < 10                 # partial rows landed

    r = sync(urls, state, hash_embedder, store, batch_size=4)
    assert r == {"updated_date=2024-01-01": 10}
    assert len(store) == 10                 # upsert de-duplicated


def test_ingest_overlaps_download_with_embed(tmp_path):
    """The downloader thread must keep feeding while the embedder is
    busy: with a slow embedder, the source should be fully drained
    before the last embed batch finishes (VERDICT.md round-1 missing
    #5 — round 1 alternated download and embed)."""
    import threading
    import time

    import numpy as np

    from abstracts_search_tpu.ingest.sync import ingest_partition
    from abstracts_search_tpu.storage.sqlite_store import init_store

    lines = [
        json.dumps({"id": f"W{i}", "title": f"t{i}", "language": "en",
                    "abstract_inverted_index": {"word": [0], f"x{i}": [1]}})
        for i in range(64)
    ]
    payload = ("\n".join(lines) + "\n").encode()

    drain_time = []
    consumed_first = threading.Event()

    def fake_urlopen(url):
        class R:
            def __init__(self):
                self._chunks = [payload[i:i + 512] for i in range(0, len(payload), 512)]
            def read(self, n):
                if not self._chunks:
                    if not drain_time:
                        drain_time.append(time.perf_counter())
                    return b""
                return self._chunks.pop(0)
            def __enter__(self):
                return self
            def __exit__(self, *a):
                return False
        return R()

    class SlowEmbedder:
        dim = 8
        def __call__(self, texts):
            consumed_first.set()
            # while we're "embedding", the producer should finish draining
            time.sleep(0.3)
            return np.ones((len(texts), 8), np.float32)

    import abstracts_search_tpu.ingest.sync as sync_mod
    orig = sync_mod.urllib.request.urlopen
    sync_mod.urllib.request.urlopen = fake_urlopen
    try:
        store = init_store(tmp_path / "s.sqlite")
        t0 = time.perf_counter()
        n = ingest_partition(["http://fake/part0"], SlowEmbedder(), store,
                             batch_size=16, compressed=False,
                             use_native_filter=False)
        t_end = time.perf_counter()
        store.close()
    finally:
        sync_mod.urllib.request.urlopen = orig
    assert n == 64
    # the download drained while embedding was still in progress: 4
    # batches x 0.3s embed ~= 1.2s total, but the producer finished
    # within the first embed sleep. Serial round-1 behavior would put
    # the drain at the very end.
    assert drain_time, "producer never drained"
    assert drain_time[0] - t0 < (t_end - t0) * 0.6, (drain_time[0] - t0, t_end - t0)
