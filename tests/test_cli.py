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
