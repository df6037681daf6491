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
