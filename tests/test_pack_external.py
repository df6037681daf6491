"""External-memory pack: equality with the in-RAM pack + bounded RAM."""

import tracemalloc

import numpy as np

from abstracts_search_tpu.index.lists import (
    load_lists,
    pack_lists,
    pack_lists_external,
)


def test_pack_external_matches_inram(tmp_path, rng):
    n, m, n_lists, seg = 50_000, 8, 64, 32
    codes = rng.integers(0, 255, (n, m), dtype=np.uint8)
    pos = rng.permutation(n).astype(np.int64)
    assign = rng.integers(0, n_lists, n).astype(np.int64)

    ref = pack_lists(codes, pos, assign, n_lists, seg_size=seg)

    # spill inputs live on disk, as in fill_stream
    codes_f = tmp_path / "codes.u8"
    pos_f = tmp_path / "pos.i64"
    codes.tofile(codes_f)
    pos.tofile(pos_f)
    codes_mm = np.memmap(codes_f, dtype=np.uint8, mode="r", shape=(n, m))
    pos_mm = np.memmap(pos_f, dtype=np.int64, mode="r", shape=(n,))

    tracemalloc.start()
    got = pack_lists_external(
        codes_mm, pos_mm, assign, n_lists, seg_size=seg,
        out_dir=tmp_path / "lists", slab_rows=4096,
    )
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    np.testing.assert_array_equal(np.asarray(got.data), ref.data)
    np.testing.assert_array_equal(np.asarray(got.row_ids), ref.row_ids)
    np.testing.assert_array_equal(got.seg_valid, ref.seg_valid)
    np.testing.assert_array_equal(got.seg_start, ref.seg_start)
    np.testing.assert_array_equal(got.seg_cnt, ref.seg_cnt)
    assert got.n_rows == n

    # bounded memory: the pack may hold O(N) index arrays (the sort
    # permutation, ~8B/row) but must NEVER hold the payloads in RAM
    # (naive concat+gather would be >= 2 * codes.nbytes on top)
    assert peak < codes.nbytes // 2 + 30 * n, peak

    # artifact written in place is loadable
    back = load_lists(tmp_path / "lists", mmap=True)
    np.testing.assert_array_equal(np.asarray(back.data), ref.data)


def test_prefetch_iterator_order_and_errors():
    from abstracts_search_tpu.utils import prefetch_iterator

    assert list(prefetch_iterator(iter(range(100)), depth=3)) == list(range(100))

    def boom():
        yield 1
        raise ValueError("boom")

    it = prefetch_iterator(boom(), depth=2)
    assert next(it) == 1
    import pytest
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_pack_distribution_sort_matches_inram(tmp_path, rng):
    """Force the two-pass bucketed external sort (bucket_bytes small) and
    require bit-identical artifacts vs the in-RAM pack — including
    zipfian list sizes and a mega-list bigger than a bucket."""
    import tracemalloc

    n, m, n_lists, seg = 60_000, 8, 96, 32
    codes = rng.integers(0, 255, (n, m), dtype=np.uint8)
    pos = rng.permutation(n).astype(np.int64)
    p = 1 / np.arange(1, n_lists + 1) ** 1.2
    assign = rng.choice(n_lists, n, p=p / p.sum()).astype(np.int64)

    ref = pack_lists(codes, pos, assign, n_lists, seg_size=seg)

    codes_f = tmp_path / "codes.u8"
    codes.tofile(codes_f)
    codes_mm = np.memmap(codes_f, dtype=np.uint8, mode="r", shape=(n, m))

    tracemalloc.start()
    got = pack_lists_external(
        codes_mm, pos, assign, n_lists, seg_size=seg,
        out_dir=tmp_path / "lists", slab_rows=4096,
        bucket_bytes=32_768,  # ~4k rows/bucket; list 0 alone is bigger
    )
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    np.testing.assert_array_equal(np.asarray(got.data), ref.data)
    np.testing.assert_array_equal(np.asarray(got.row_ids), ref.row_ids)
    np.testing.assert_array_equal(got.seg_valid, ref.seg_valid)
    np.testing.assert_array_equal(got.seg_start, ref.seg_start)
    np.testing.assert_array_equal(got.seg_cnt, ref.seg_cnt)
    # RAM scales with the largest bucket (the zipf-hot mega-list: its
    # payload + ~64 B/row of pack index temporaries), never the corpus
    hot_rows = int(np.bincount(assign, minlength=n_lists).max())
    assert peak < 90 * hot_rows + 300_000, (peak, hot_rows)
    # no leftover bucket spill dirs
    assert not list(tmp_path.glob("astpu_pack_*"))


def test_resegment_matches_direct_pack(tmp_path, rng):
    """resegment_lists(old -> old/2) must produce BYTE-IDENTICAL
    artifacts to packing at the smaller seg_size directly (same row
    order, same tail-block dropping), in both payload layouts."""
    from abstracts_search_tpu.index.lists import (
        load_lists, pack_lists, resegment_lists, save_lists)

    n, mb, n_lists = 3000, 8, 13
    payloads = rng.integers(0, 255, (n, mb), dtype=np.uint8)
    positions = rng.permutation(n).astype(np.int64)
    assigns = rng.integers(0, n_lists, n)
    # skew: make one list huge and a few empty
    assigns[: n // 3] = 4
    assigns[assigns == 7] = 4

    for transposed in (False, True):
        big = pack_lists(payloads, positions, assigns, n_lists,
                         seg_size=64, transposed=transposed)
        ref = pack_lists(payloads, positions, assigns, n_lists,
                         seg_size=32, transposed=transposed)
        d_big = tmp_path / f"big{int(transposed)}"
        d_new = tmp_path / f"new{int(transposed)}"
        save_lists(big, d_big)
        resegment_lists(d_big, d_new, 32)
        got = load_lists(d_new)
        assert got.seg_size == 32 and got.n_rows == n
        np.testing.assert_array_equal(np.asarray(got.data), ref.data)
        np.testing.assert_array_equal(np.asarray(got.row_ids), ref.row_ids)
        np.testing.assert_array_equal(got.seg_valid, ref.seg_valid)
        np.testing.assert_array_equal(got.seg_start, ref.seg_start)
        np.testing.assert_array_equal(got.seg_cnt, ref.seg_cnt)
