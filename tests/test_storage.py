"""Storage layer tests: SQLite store + parquet shards + round trips.

Covers the `init/build(upsert)/dump/recover` contract of the reference
(Makefile:46-49,71-72,98-100) at small scale.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from abstracts_search_tpu.storage import (
    EmbeddingStore,
    ShardReader,
    ShardWriter,
    dump_store_to_shards,
    load_shards_to_store,
)
from abstracts_search_tpu.storage.sqlite_store import init_store

DIM = 16


def _mk_rows(rng, n, start=0):
    ids = [f"W{start + i:08d}" for i in range(n)]
    embs = rng.standard_normal((n, DIM)).astype(np.float32)
    return ids, embs


def test_store_init_upsert_get(tmp_path, rng):
    store = init_store(tmp_path / "data.sqlite")
    ids, embs = _mk_rows(rng, 100)
    store.upsert(ids, embs)
    assert len(store) == 100
    np.testing.assert_array_equal(store.get(ids[7]), embs[7])
    assert store.dim == DIM

    # upsert overwrites (idempotent partition re-streaming, SURVEY.md §5)
    new = rng.standard_normal((1, DIM)).astype(np.float32)
    store.upsert([ids[7]], new)
    assert len(store) == 100
    np.testing.assert_array_equal(store.get(ids[7]), new[0])


def test_store_init_refuses_overwrite(tmp_path):
    init_store(tmp_path / "d.sqlite").close()
    with pytest.raises(FileExistsError):
        init_store(tmp_path / "d.sqlite")


def test_store_dim_mismatch(tmp_path, rng):
    store = init_store(tmp_path / "d.sqlite")
    store.upsert(["a"], rng.standard_normal((1, DIM)).astype(np.float32))
    with pytest.raises(ValueError):
        store.upsert(["b"], rng.standard_normal((1, DIM + 1)).astype(np.float32))


def test_shard_writer_layout(tmp_path, rng):
    """Shard/row-group sizes match the configured layout (README.md:60 analog)."""
    ids, embs = _mk_rows(rng, 1000)
    with ShardWriter(tmp_path / "data", DIM, shard_size=384, row_group_size=128) as w:
        # write in awkward chunk sizes to exercise splitting
        for lo in range(0, 1000, 77):
            w.write(ids[lo : lo + 77], embs[lo : lo + 77])

    reader = ShardReader(tmp_path / "data")
    assert len(reader) == 1000
    # 1000 rows / 384-row shards -> 3 shards: 384, 384, 232
    assert reader.num_shards == 3
    f0 = pq.ParquetFile(reader.paths[0])
    assert f0.metadata.num_rows == 384
    assert f0.metadata.row_group(0).num_rows == 128

    got_ids, got = reader.read_all()
    assert got_ids == ids
    np.testing.assert_allclose(got, embs)


def test_dump_recover_roundtrip(tmp_path, rng):
    """sqlite -> parquet -> sqlite round trip (`make recover`, Makefile:98-101)."""
    store = init_store(tmp_path / "a.sqlite")
    ids, embs = _mk_rows(rng, 500)
    store.upsert(ids, embs)
    n = dump_store_to_shards(store, tmp_path / "data", shard_size=200, row_group_size=64)
    assert n == 500

    store2 = init_store(tmp_path / "b.sqlite")
    n2 = load_shards_to_store(tmp_path / "data", store2)
    assert n2 == 500
    assert len(store2) == 500
    for i in (0, 123, 499):
        np.testing.assert_array_equal(store2.get(ids[i]), store.get(ids[i]))


def test_shard_sample(tmp_path, rng):
    ids, embs = _mk_rows(rng, 2000)
    with ShardWriter(tmp_path / "data", DIM, shard_size=1024, row_group_size=256) as w:
        w.write(ids, embs)
    reader = ShardReader(tmp_path / "data")
    s = reader.sample(300, seed=1)
    assert s.shape == (300, DIM)
    # sampled rows are real corpus rows
    corpus = {e.tobytes() for e in embs}
    assert all(row.tobytes() in corpus for row in s)
