"""Serving hardening: concurrent first queries + batch endpoint.

VERDICT.md round-1 weak #6: ThreadingHTTPServer drove a shared engine
whose compile-on-miss search cache was unsynchronized. The index now
single-flights compiles; the app adds POST /search for batches and the
engine warms the hot shape at startup.
"""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from abstracts_search_tpu.index.ivfpq import IVFPQIndex
from abstracts_search_tpu.models.registry import HashEmbedder
from abstracts_search_tpu.parallel import build_mesh
from abstracts_search_tpu.serve.app import make_handler
from abstracts_search_tpu.serve.engine import SearchEngine


@pytest.fixture(scope="module")
def engine():
    rng = np.random.default_rng(0)
    emb = HashEmbedder(24)
    docs = [f"document number {i} about subject {i % 13}" for i in range(400)]
    x = emb(docs)
    idx = IVFPQIndex(8, 24, pq_m=4, pq_nbits=4, use_opq=False,
                     mesh=build_mesh(), seg_size=32, chunk=128, seed=0)
    idx.train(x, kmeans_iters=4, pq_iters=4)
    idx.fill(x)
    ids = [f"https://openalex.org/W{i}" for i in range(400)]
    return SearchEngine(idx, ids, emb, nprobe=4)


@pytest.fixture(scope="module")
def server(engine):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_concurrent_first_queries_compile_safely(server):
    """8 concurrent queries with NOVEL (qn, k) shapes — each misses the
    compile cache; unsynchronized round-1 raced here."""
    errors = []
    results = {}

    def hit(k):
        try:
            with urllib.request.urlopen(
                f"{server}/search?q=subject%20{k}&k={k}", timeout=120
            ) as r:
                results[k] = json.loads(r.read())
        except Exception as e:  # noqa: BLE001
            errors.append((k, e))

    threads = [threading.Thread(target=hit, args=(k,)) for k in range(3, 11)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    for k, body in results.items():
        assert len(body["results"]) <= k
        assert all(r["id"].startswith("https://") for r in body["results"])


def test_batch_endpoint(server):
    payload = json.dumps({
        "queries": ["subject 3", "subject 7", "document number 11"],
        "k": 5,
    }).encode()
    req = urllib.request.Request(f"{server}/search", data=payload,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.loads(r.read())
    assert len(body["results"]) == 3
    for row in body["results"]:
        assert 0 < len(row) <= 5
        assert all("id" in hit and "score" in hit for hit in row)


def test_batch_endpoint_rejects_bad_input(server):
    req = urllib.request.Request(
        f"{server}/search", data=b'{"queries": "not a list"}',
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_warmup_compiles_single_query_path(engine):
    engine.index._search_cache.clear()
    engine.warmup()
    keys = list(engine.index._search_cache)
    # a fresh engine warms the two-step (probe + scan/rank) programs; an
    # engine whose speculative shapes survived earlier traffic warms the
    # fused steady-state program instead — either way qn=1 is compiled
    assert any(
        (k[0] in ("probe", "probe_csr", "fscan") and k[1] == 1)
        for k in keys
    ), keys
    assert any(k[0] in ("scan", "rank", "fscan") for k in keys), keys


def test_micro_batcher_folds_concurrent_requests(engine):
    """Concurrent single-query requests share batched device searches:
    correctness per request, and at least one real fold (batch > 1)."""
    import threading

    from abstracts_search_tpu.serve.batcher import MicroBatcher

    b = MicroBatcher(engine, max_batch=16, window_s=0.05)
    try:
        results = {}
        errors = []

        def hit(i):
            try:
                results[i] = b.search(f"query {i}", k=3 + (i % 2))
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert len(results) == 12
        for i, rows in results.items():
            assert len(rows) == 3 + (i % 2)       # per-request k honored
            assert all("id" in r and "score" in r for r in rows)
        assert b.stats["requests"] == 12
        assert b.stats["batches"] < 12            # something actually folded
        assert b.stats["max_batch_seen"] > 1
        # per-request results must equal an unbatched search
        solo = engine.search("query 5", k=4)
        assert [r["id"] for r in results[5]] == [r["id"] for r in solo]
    finally:
        b.close()


def test_micro_batcher_propagates_errors(engine):
    from abstracts_search_tpu.serve.batcher import MicroBatcher

    class Boom(Exception):
        pass

    def explode(*a, **kw):
        raise Boom("nope")

    b = MicroBatcher(engine, max_batch=4, window_s=0.01)
    try:
        orig = engine.encode_queries
        engine.encode_queries = explode
        import pytest

        with pytest.raises(Boom):
            b.search("x", k=3)
        engine.encode_queries = orig
        # batcher survives the failure and serves again
        assert b.search("query 1", k=3)
    finally:
        b.close()


def test_micro_batcher_never_encodes_padding(engine):
    """Bucket padding must not re-run the encoder on duplicate texts
    (round-4 VERDICT weak #4): a 3-request fold pads the SCAN batch to
    4, but the encoder sees exactly the 3 real texts."""
    import threading

    from abstracts_search_tpu.serve.batcher import MicroBatcher

    encoded_counts = []
    scan_batches = []
    orig_enc = engine.encode_queries
    orig_scan = engine.search_batch_encoded

    def counting_enc(texts):
        encoded_counts.append(len(texts))
        return orig_enc(texts)

    def counting_scan(q, k=10):
        scan_batches.append(len(q))
        return orig_scan(q, k)

    engine.encode_queries = counting_enc
    engine.search_batch_encoded = counting_scan
    # generous window so all three concurrent requests fold into one
    # batch of 3 (padded to a scan batch of 4)
    b = MicroBatcher(engine, max_batch=16, window_s=0.5)
    results = {}
    try:
        threads = [
            threading.Thread(
                target=lambda i=i: results.setdefault(
                    i, b.search(f"padding probe {i}", k=3)))
            for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    finally:
        b.close()
        engine.encode_queries = orig_enc
        engine.search_batch_encoded = orig_scan
    assert sorted(results) == [0, 1, 2]
    assert sum(encoded_counts) == 3          # no duplicate encodes
    # every scan batch is a pow2 bucket >= its encode batch
    assert all(s in (1, 2, 4) for s in scan_batches), scan_batches
    assert scan_batches and max(scan_batches) >= max(encoded_counts)
    # per-request correctness through the padded path
    solo = engine.search("padding probe 1", k=3)
    assert [r["id"] for r in results[1]] == [r["id"] for r in solo]


def test_micro_batcher_pipelines_batches(engine):
    """With workers>1 a dispatch in flight must not block the next
    batch (round-4 http_serve_report: one worker serialized batches and
    LOST to un-batched threads, 43 vs 88 QPS — dead tunnel-RTT time).
    Folding semantics stay single-worker (gather mutex): the padding /
    folding tests above run unchanged under the default worker pool."""
    import time

    from abstracts_search_tpu.serve.batcher import MicroBatcher

    orig = engine.search_batch_encoded
    first_in = threading.Event()
    release_first = threading.Event()
    ncalls = []
    lk = threading.Lock()

    def slow_scan(q, k=10):
        with lk:
            ncalls.append(len(q))
            first = len(ncalls) == 1
        if first:
            first_in.set()
            assert release_first.wait(30), "second batch never dispatched"
        return orig(q, k)

    engine.search_batch_encoded = slow_scan
    b = MicroBatcher(engine, max_batch=4, window_s=0.01, workers=2)
    try:
        r1 = []
        t1 = threading.Thread(
            target=lambda: r1.append(b.search("pipelined a", k=3)))
        t1.start()
        assert first_in.wait(30)
        # batch 1 is stalled inside its dispatch; batch 2 must still be
        # gathered and fully served by the sibling worker
        t0 = time.monotonic()
        r2 = b.search("pipelined b", k=3)
        assert r2 and time.monotonic() - t0 < 20
        release_first.set()
        t1.join(30)
        assert r1 and r1[0]
    finally:
        release_first.set()
        engine.search_batch_encoded = orig
        b.close()
    assert len(ncalls) == 2


def test_micro_batcher_multiworker_close(engine):
    """close() must terminate EVERY worker (the shutdown sentinel is
    re-posted worker-to-worker) and still fail late arrivals loudly."""
    from abstracts_search_tpu.serve.batcher import MicroBatcher

    b = MicroBatcher(engine, max_batch=4, window_s=0.005, workers=3)
    assert b.search("before close", k=2)
    b.close()
    for t in b._threads:
        assert not t.is_alive()
    with pytest.raises(RuntimeError):
        b.search("after close", k=2)
