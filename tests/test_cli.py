"""CLI surface tests (in-process; jax-free subcommands)."""

import json

import pytest

from abstracts_search_tpu.cli import main
from abstracts_search_tpu.storage.sqlite_store import EmbeddingStore


@pytest.fixture()
def in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("ASTPU_EMBED_DIM", "16")
    return tmp_path


def test_cli_init_build_dump_recover(in_tmp, capsys):
    assert main(["init", "data.sqlite"]) == 0

    jsonl = in_tmp / "docs.jsonl"
    jsonl.write_text(
        "\n".join(
            json.dumps({"id": f"https://openalex.org/W{i}", "document": f"doc {i}"})
            for i in range(25)
        )
    )
    assert main(["build", "--embedder", "hash", "-b", "4",
                 "--input", str(jsonl), "data.sqlite"]) == 0
    store = EmbeddingStore("data.sqlite")
    assert len(store) == 25 and store.dim == 16
    store.close()

    assert main(["dump", "--shard-size", "10", "--row-group-size", "5",
                 "data.sqlite", "shards"]) == 0
    assert len(list((in_tmp / "shards").glob("data_*.parquet"))) == 3

    assert main(["dump", "shards", "rec.sqlite"]) == 0
    rec = EmbeddingStore("rec.sqlite")
    assert len(rec) == 25
    rec.close()


def test_cli_init_refuses_existing(in_tmp, capsys):
    assert main(["init", "d.sqlite"]) == 0
    assert main(["init", "d.sqlite"]) == 1
    assert "error" in capsys.readouterr().err


def test_cli_build_idempotent_reupsert(in_tmp):
    main(["init", "d.sqlite"])
    jsonl = in_tmp / "x.jsonl"
    jsonl.write_text(json.dumps({"id": "W1", "document": "hello"}) + "\n")
    main(["build", "--embedder", "hash", "--input", str(jsonl), "d.sqlite"])
    main(["build", "--embedder", "hash", "--input", str(jsonl), "d.sqlite"])
    store = EmbeddingStore("d.sqlite")
    assert len(store) == 1
    store.close()


def test_multihost_flags_initialize_distributed(monkeypatch, tmp_path, capsys):
    """--coordinator/--num-processes join the jax.distributed runtime
    before any backend work (multi-host entry, SURVEY.md §5)."""
    import abstracts_search_tpu.parallel.mesh as mesh_mod
    from abstracts_search_tpu.cli import main

    calls = []
    monkeypatch.setattr(
        mesh_mod, "init_distributed",
        lambda coord, n, pid=None: calls.append((coord, n, pid)),
    )
    db = tmp_path / "d.sqlite"
    rc = main(["--coordinator", "10.0.0.1:1234", "--num-processes", "4",
               "--process-id", "2", "init", str(db)])
    assert rc == 0 and db.exists()
    assert calls == [("10.0.0.1:1234", 4, 2)]


def test_coordinator_requires_num_processes(tmp_path, capsys):
    from abstracts_search_tpu.cli import main

    rc = main(["--coordinator", "10.0.0.1:1234", "init", str(tmp_path / "x.sqlite")])
    assert rc == 1
    assert "num-processes" in capsys.readouterr().err
