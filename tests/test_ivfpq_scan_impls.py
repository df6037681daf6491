"""The two IVF-PQ scan paths (XLA map vs Pallas slots) must agree."""

import numpy as np

from abstracts_search_tpu.index.ivfpq import IVFPQIndex
from abstracts_search_tpu.parallel import build_mesh


def test_slots_path_matches_map_path(rng):
    n, d = 2000, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.standard_normal((9, d)).astype(np.float32)

    mesh = build_mesh()
    idx = IVFPQIndex(8, d, pq_m=8, pq_nbits=4, use_opq=True,
                     mesh=mesh, seg_size=32, chunk=128, seed=0, scan_impl="map")
    idx.train(x, kmeans_iters=5, opq_iters=2, pq_iters=5)
    idx.fill(x)

    v_map, p_map = idx.search(q, 7, nprobe=4)

    idx.scan_impl = "slots"
    idx._search_cache.clear()
    v_sl, p_sl = idx.search(q, 7, nprobe=4)

    # bf16 one-hot matvec vs f32 gather: scores near-equal, same ranking
    np.testing.assert_allclose(v_sl, v_map, rtol=2e-2, atol=2e-2)
    agree = np.mean([
        len(set(p_sl[i]) & set(p_map[i])) / 7 for i in range(len(q))
    ])
    assert agree > 0.9, agree


def test_slots_path_k_exceeds_candidates(rng):
    x = rng.standard_normal((50, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = IVFPQIndex(8, 16, pq_m=4, pq_nbits=4, use_opq=False,
                     mesh=build_mesh(), seg_size=8, chunk=128, scan_impl="slots")
    idx.train(x, kmeans_iters=3, pq_iters=3)
    idx.fill(x)
    v, pos = idx.search(x[:2], 40, nprobe=1)
    assert (pos[v == -np.inf] == -1).all()
