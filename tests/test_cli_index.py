"""CLI `index train/tune/fill/clean` flag plumbing (TRAINFLAGS parity)."""

import json

import numpy as np
import pytest

from abstracts_search_tpu.cli import main
from abstracts_search_tpu.storage.shards import ShardWriter


@pytest.fixture()
def data_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((300, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    ids = [f"W{i}" for i in range(300)]
    with ShardWriter(tmp_path / "data", 16, shard_size=128, row_group_size=32) as w:
        w.write(ids, x)
    return tmp_path


def test_cli_index_train_tune_fill_clean(data_dir):
    # train -N -c parity (reference TRAINFLAGS='-N -c 65536', README.md:60)
    assert main(["index", "-B", "idx", "train", "-N", "-c", "4",
                 "--pq-m", "4", "--pq-nbits", "4", "--iters", "4", "data"]) == 0
    assert (data_dir / "idx" / "empty" / "meta.json").exists()
    assert (data_dir / "idx" / "untuned.json").exists()
    meta = json.loads((data_dir / "idx" / "empty" / "meta.json").read_text())
    assert meta["n_lists"] == 4 and meta["pq_m"] == 4 and meta["spherical"] is True

    assert main(["index", "-B", "idx", "fill", "data"]) == 0
    assert (data_dir / "idx" / "ids.parquet").exists()
    assert (data_dir / "idx" / "index" / "lists" / "codes.bin").exists()

    assert main(["index", "-B", "idx", "tune", "--k", "5",
                 "--target-recall", "0.8", "data"]) == 0
    params = json.loads((data_dir / "idx" / "params.json").read_text())
    assert params["k"] == 5 and params["operating_points"]

    # rerunning train without --force is the order-only no-op
    before = (data_dir / "idx" / "empty" / "meta.json").stat().st_mtime_ns
    assert main(["index", "-B", "idx", "train", "-N", "-c", "4", "data"]) == 0
    assert (data_dir / "idx" / "empty" / "meta.json").stat().st_mtime_ns == before

    assert main(["index", "-B", "idx", "--source", "data", "clean"]) == 0
    assert not (data_dir / "idx").exists()
