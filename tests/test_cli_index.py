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


def test_cli_index_resegment(data_dir):
    """`index resegment --seg-size N` rewrites the filled artifact at a
    smaller segment size in place; search results are unchanged."""
    from abstracts_search_tpu.index.ivfpq import IVFPQIndex
    from abstracts_search_tpu.parallel import build_mesh

    assert main(["index", "-B", "idx", "train", "-N", "-c", "4",
                 "--pq-m", "4", "--pq-nbits", "4", "--iters", "4", "data"]) == 0
    assert main(["index", "-B", "idx", "fill", "data"]) == 0

    filled = data_dir / "idx" / "index"
    idx = IVFPQIndex.load(filled, mesh=build_mesh())
    rng = np.random.default_rng(1)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    v1, p1 = idx.search(q, 5, nprobe=4)
    old_seg = idx.seg_size

    assert main(["index", "-B", "idx", "resegment",
                 "--seg-size", str(old_seg // 2)]) == 0
    meta = json.loads((filled / "meta.json").read_text())
    assert meta["seg_size"] == old_seg // 2

    idx2 = IVFPQIndex.load(filled, mesh=build_mesh())
    assert idx2.seg_size == old_seg // 2
    v2, p2 = idx2.search(q, 5, nprobe=4)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-6)

    # idempotent second call
    assert main(["index", "-B", "idx", "resegment",
                 "--seg-size", str(old_seg // 2)]) == 0


def test_resegment_crash_recovery_and_mismatch_guard(data_dir):
    """A mismatched meta/lists seg_size refuses to load (silent wrong
    positions otherwise); the resegment command recovers both crash
    windows (backup-only and swapped-but-meta-stale)."""
    from abstracts_search_tpu.index.ivfpq import IVFPQIndex
    from abstracts_search_tpu.parallel import build_mesh

    assert main(["index", "-B", "idx", "train", "-N", "-c", "4",
                 "--pq-m", "4", "--pq-nbits", "4", "--iters", "4", "data"]) == 0
    assert main(["index", "-B", "idx", "fill", "data"]) == 0
    filled = data_dir / "idx" / "index"
    meta_path = filled / "meta.json"
    meta = json.loads(meta_path.read_text())
    old_seg = meta["seg_size"]

    # inconsistent artifact directory must be loud
    meta["seg_size"] = old_seg // 2
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="seg_size"):
        IVFPQIndex.load(filled, mesh=build_mesh())
    meta["seg_size"] = old_seg
    meta_path.write_text(json.dumps(meta))

    # crash window 1: lists renamed to backup, nothing else happened
    (filled / "lists").rename(filled / "lists.old")
    assert main(["index", "-B", "idx", "resegment",
                 "--seg-size", str(old_seg // 2)]) == 0
    assert not (filled / "lists.old").exists()
    assert json.loads(meta_path.read_text())["seg_size"] == old_seg // 2
    idx = IVFPQIndex.load(filled, mesh=build_mesh())
    assert idx.seg_size == old_seg // 2

    # crash window 2: lists swapped but meta not yet updated
    meta = json.loads(meta_path.read_text())
    meta["seg_size"] = old_seg
    meta_path.write_text(json.dumps(meta))
    assert main(["index", "-B", "idx", "resegment",
                 "--seg-size", str(old_seg // 2)]) == 0
    assert json.loads(meta_path.read_text())["seg_size"] == old_seg // 2
    IVFPQIndex.load(filled, mesh=build_mesh())
