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
