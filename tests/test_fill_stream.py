"""Streaming fill must equal one-shot fill (the 207M-scale path)."""

import numpy as np
import pytest

from abstracts_search_tpu.index.ivfpq import IVFPQIndex
from abstracts_search_tpu.parallel import build_mesh


def test_fill_stream_matches_oneshot(rng):
    n, d = 1500, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    mesh = build_mesh()

    a = IVFPQIndex(8, d, pq_m=4, pq_nbits=4, use_opq=False,
                   mesh=mesh, seg_size=32, chunk=128, seed=0)
    a.train(x, kmeans_iters=4, pq_iters=4)
    a.fill(x)

    b = IVFPQIndex(8, d, pq_m=4, pq_nbits=4, use_opq=False,
                   mesh=mesh, seg_size=32, chunk=128, seed=0)
    b.train(x, kmeans_iters=4, pq_iters=4)
    pos = np.arange(n, dtype=np.int64)
    b.fill_stream(
        (x[lo:lo + 400], pos[lo:lo + 400]) for lo in range(0, n, 400)
    )

    q = x[:6]
    va, pa = a.search(q, 5, nprobe=8)
    vb, pb = b.search(q, 5, nprobe=8)
    np.testing.assert_allclose(va, vb, atol=1e-5)
    np.testing.assert_array_equal(pa, pb)


def test_fill_encoded_stream_matches_fill(tmp_path, rng):
    """Pre-encoded chunks (the device-side-generator / multi-host fill
    entry, benchmarks/scale8m_bench.py) must build the same index as
    fill_stream over the raw vectors."""
    n, d = 1200, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    mesh = build_mesh()
    pos = np.arange(n, dtype=np.int64)

    a = IVFPQIndex(8, d, pq_m=4, pq_nbits=4, use_opq=False,
                   mesh=mesh, seg_size=32, chunk=128, seed=0)
    a.train(x, kmeans_iters=4, pq_iters=4)
    a.fill(x)

    b = IVFPQIndex(8, d, pq_m=4, pq_nbits=4, use_opq=False,
                   mesh=mesh, seg_size=32, chunk=128, seed=0)
    b.train(x, kmeans_iters=4, pq_iters=4)

    def encoded():
        for lo in range(0, n, 400):
            assign, codes = b.encode(x[lo:lo + 400])
            yield assign, codes, pos[lo:lo + 400]

    b.fill_encoded_stream(encoded(), lists_dir=tmp_path / "lists")
    assert isinstance(b.packed.data, np.memmap)

    q = x[:6]
    va, pa = a.search(q, 5, nprobe=8)
    vb, pb = b.search(q, 5, nprobe=8)
    np.testing.assert_allclose(va, vb, atol=1e-5)
    np.testing.assert_array_equal(pa, pb)


def test_refill_refused(rng):
    """A second fill() would silently REPLACE the lists while numbering
    rows as if appending — it must be refused (ADVICE.md round 1)."""
    x = rng.standard_normal((300, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = IVFPQIndex(4, 16, pq_m=4, pq_nbits=4, use_opq=False,
                     mesh=build_mesh(), seg_size=32, chunk=128, seed=0)
    idx.train(x, kmeans_iters=3, pq_iters=3)
    idx.fill(x)
    with pytest.raises(RuntimeError, match="already filled"):
        idx.fill(x)


def test_fill_stream_spill_path_matches_inram(tmp_path, rng):
    """lists_dir fill (spill + external pack into the memmap artifact)
    must equal the in-RAM pack, and the artifact must be complete on
    disk (no later save needed)."""
    n, d = 1500, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    mesh = build_mesh()
    pos = np.arange(n, dtype=np.int64)

    a = IVFPQIndex(8, d, pq_m=4, pq_nbits=4, use_opq=False,
                   mesh=mesh, seg_size=32, chunk=128, seed=0)
    a.train(x, kmeans_iters=4, pq_iters=4)
    a.fill(x)

    b = IVFPQIndex(8, d, pq_m=4, pq_nbits=4, use_opq=False,
                   mesh=mesh, seg_size=32, chunk=128, seed=0)
    b.train(x, kmeans_iters=4, pq_iters=4)
    b.fill_stream(
        ((x[lo:lo + 400], pos[lo:lo + 400]) for lo in range(0, n, 400)),
        lists_dir=tmp_path / "idx" / "lists",
    )
    assert isinstance(b.packed.data, np.memmap)
    # no spill dirs left behind
    assert not list((tmp_path / "idx").glob("astpu_fill_*"))

    q = x[:6]
    va, pa = a.search(q, 5, nprobe=8)
    vb, pb = b.search(q, 5, nprobe=8)
    np.testing.assert_allclose(va, vb, atol=1e-5)
    np.testing.assert_array_equal(pa, pb)

    # the artifact on disk is already complete: save skips the rewrite
    # and load returns identical results
    import os
    before = os.path.getmtime(tmp_path / "idx" / "lists" / "codes.bin")
    b.save(tmp_path / "idx")
    assert os.path.getmtime(tmp_path / "idx" / "lists" / "codes.bin") == before
    c = IVFPQIndex.load(tmp_path / "idx", mesh=mesh, chunk=128)
    vc, pc = c.search(q, 5, nprobe=8)
    np.testing.assert_allclose(va, vc, atol=1e-5)
    np.testing.assert_array_equal(pa, pc)
