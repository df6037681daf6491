"""End-to-end pipeline: manifest -> ingest -> dump -> train -> fill ->
tune -> serve, with Makefile-parity rebuild semantics (SURVEY.md §3.1-3.2).

Runs fully offline: file:// manifest + gzip part files + hash embedder.
"""

import gzip
import json
import threading
import urllib.error
import urllib.request
from pathlib import Path

import pytest

from abstracts_search_tpu.config import Config
from abstracts_search_tpu.driver import Driver, read_ids_parquet
from abstracts_search_tpu.serve.engine import SearchEngine


def _work(i, date):
    return {
        "id": f"https://openalex.org/W{date}x{i}",
        "title": f"Study {i}",
        "language": "en",
        "abstract_inverted_index": {
            f"topic{i % 7}": [0], "research": [1], f"detail{i}": [2],
        },
    }


def _make_snapshot(root: Path, dates_counts):
    """Write gzip part files + a manifest JSON; return manifest file:// URL."""
    entries = []
    for date, n in dates_counts:
        pdir = root / "snapshot" / f"updated_date={date}"
        pdir.mkdir(parents=True, exist_ok=True)
        part = pdir / "part_000.gz"
        lines = "\n".join(json.dumps(_work(i, date)) for i in range(n)) + "\n"
        part.write_bytes(gzip.compress(lines.encode()))
        entries.append({"url": part.as_uri()})
    manifest = root / "manifest.json"
    manifest.write_text(json.dumps({"entries": entries}))
    return manifest.as_uri()


def _cfg(root: Path, manifest_url: str) -> Config:
    return Config(
        manifest_url=manifest_url,
        embed_dim=32,
        ivf_centroids=4,
        pq_m=8,
        pq_nbits=4,
        train_sample=10_000,
        shard_size=64,
        row_group_size=16,
        embed_batch=8,
    )


@pytest.fixture()
def pipeline(tmp_path):
    url = _make_snapshot(tmp_path, [("2024-01-01", 60)])
    cfg = _cfg(tmp_path, url)
    driver = Driver(cfg, root=tmp_path, embedder="hash")
    return tmp_path, cfg, driver


def test_full_pipeline_and_incremental_sync(pipeline):
    tmp_path, cfg, d = pipeline

    # --- initial full build ---------------------------------------------
    res = d.target_build()
    assert res == {"updated_date=2024-01-01": 60}
    assert d.target_dump() == 60
    assert d.target_train() is True
    assert d.target_fill() is True
    assert d.target_tune() is True

    # artifact parity with the reference layout (Makefile:11-13)
    assert (d.empty_dir / "meta.json").exists()          # empty.faiss analog
    assert d.untuned_path.exists()                       # untuned.json
    assert (d.filled_dir / "lists" / "codes.bin").exists()  # index.faiss+ivfdata
    assert d.ids_path.exists()                           # ids.parquet
    assert d.params_path.exists()                        # params.json
    ids = read_ids_parquet(d.ids_path)
    assert len(ids) == 60 and ids[0].startswith("https://openalex.org/W")

    params = json.loads(d.params_path.read_text())
    assert params["achieved_recall"] > 0.5
    assert any(p["recall"] >= params["achieved_recall"] for p in params["operating_points"])

    # --- rerun: everything is a no-op (order-only retrain semantics) -----
    assert d.target_build() == {}
    assert d.target_dump() == 0
    assert d.target_train() is False
    assert d.target_fill() is False
    assert d.target_tune() is False

    # --- quarterly sync: new partition appears ---------------------------
    url2 = _make_snapshot(tmp_path, [("2024-01-01", 60), ("2024-04-01", 20)])
    d.cfg = d.cfg.replace(manifest_url=url2)
    res2 = d.target_build()
    assert res2 == {"updated_date=2024-04-01": 20}
    assert d.target_dump() == 80                         # full re-export
    assert d.target_train() is False                     # frozen quantizer
    assert d.target_fill() is True                       # re-fill with delta
    assert len(read_ids_parquet(d.ids_path)) == 80

    # --- recover from the published dataset ------------------------------
    d.store_path.unlink()
    import shutil
    shutil.rmtree(d.events_dir)
    assert d.target_recover() == 80
    assert d.target_build() == {}                        # sync position restored

    # --- clean ------------------------------------------------------------
    d.target_clean()
    assert not d.index_dir.exists() and not d.store_path.exists()


def test_search_engine_end_to_end(pipeline):
    tmp_path, cfg, d = pipeline
    d.target_build()
    d.target_dump()
    d.target_fill()
    d.target_tune()

    def fake_fetcher(url: str) -> bytes:
        # serve fake OpenAlex metadata for whatever ids are requested
        import urllib.parse
        q = urllib.parse.unquote(url)
        ids = [s for s in q.split("openalex:")[-1].split("&")[0].split("|")]
        return json.dumps({"results": [
            {"id": f"https://openalex.org/{i}", "title": f"Hydrated {i}",
             "publication_year": 2024, "authorships": []}
            for i in ids
        ]}).encode()

    engine = SearchEngine.from_artifacts(
        cfg, index_dir=d.index_dir, embedder="hash", hydrate=True, fetcher=fake_fetcher,
    )
    # the hash embedder maps identical text to identical vectors, so
    # searching a known document text must return that document first
    target = _work(17, "2024-01-01")
    doc_text = f"{target['title']} topic3 research detail17"
    results = engine.search(doc_text, k=5)
    assert results[0]["id"] == target["id"]
    assert results[0]["score"] > 0.8  # ADC score is PQ-approximate
    assert results[0]["title"].startswith("Hydrated")   # hydration merged in

    batch = engine.search_batch([doc_text, "unrelated query text"], k=3)
    assert batch[0][0]["id"] == target["id"]


def test_http_server(pipeline):
    tmp_path, cfg, d = pipeline
    d.target_build()
    d.target_dump()
    d.target_fill()

    engine = SearchEngine.from_artifacts(
        cfg, index_dir=d.index_dir, embedder="hash", hydrate=False,
    )
    from http.server import ThreadingHTTPServer
    from abstracts_search_tpu.serve.app import make_handler

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.loads(r.read())["ok"] is True
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/search?q=Study%2011%20topic4%20research%20detail11&k=3"
        ) as r:
            data = json.loads(r.read())
        assert data["results"][0]["id"] == "https://openalex.org/W2024-01-01x11"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert b"abstracts-search" in r.read()
        # missing q -> 400
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/search")
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_publish_stages_recoverable_tree(pipeline, monkeypatch, capsys):
    """`astpu publish --out` stages complete upload trees (reference
    datasets abstracts-embeddings/abstracts-faiss, README.md:8,10) that
    recover can bootstrap from."""
    tmp_path, cfg, d = pipeline
    d.target_build()
    d.target_dump()
    d.target_fill()
    d.target_tune()

    from abstracts_search_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    out = tmp_path / "staged"
    assert main(["publish", "--out", str(out)]) == 0
    printed = capsys.readouterr().out
    assert "hf upload" in printed

    emb = out / "abstracts-embeddings"
    fss = out / "abstracts-faiss"
    assert (emb / "data").is_dir() and (emb / "events").is_dir()
    assert (fss / "index" / "index" / "lists" / "codes.bin").exists()
    assert (fss / "index" / "ids.parquet").exists()
    assert (fss / "index" / "params.json").exists()
    manifest = json.loads((emb / "publish_manifest.json").read_text())
    assert any(k.startswith("data/data_") for k in manifest)

    # the staged tree is a valid recovery source (Makefile:98-101 parity)
    cfg2 = cfg.replace(data_dir=str(emb / "data"), store_path=str(tmp_path / "r.sqlite"))
    d2 = Driver(cfg2, root=tmp_path, embedder="hash")
    assert d2.target_recover() == 60


def test_dump_merges_per_host_stores(pipeline):
    """Multi-host builds ingest into per-host stores (data.sqlite.p<pid>);
    dump on process 0 folds them into the main store first (DESIGN.md §7)."""
    import numpy as np

    from abstracts_search_tpu.storage.sqlite_store import init_store

    tmp_path, cfg, d = pipeline
    d.target_build()          # main store: 60 rows

    rng = np.random.default_rng(1)
    for pid, ids in ((0, ["https://openalex.org/Wp0a", "https://openalex.org/Wp0b"]),
                     (1, ["https://openalex.org/Wp1a"])):
        s = init_store(d.store_path.with_name(d.store_path.name + f".p{pid}"))
        s.upsert(ids, rng.standard_normal((len(ids), 32)).astype(np.float32))
        s.close()

    assert d.target_dump(force=True) == 63
    ids = set()
    from abstracts_search_tpu.storage.shards import ShardReader
    r = ShardReader(d.data_dir)
    for batch_ids, _ in r.iter_row_groups():
        ids.update(batch_ids)
    assert {"https://openalex.org/Wp0a", "https://openalex.org/Wp0b",
            "https://openalex.org/Wp1a"} <= ids
    assert len(ids) == 63

    # re-dump is idempotent (INSERT OR REPLACE re-merge)
    assert d.target_dump(force=True) == 63
