"""IVF-Flat: packing, recall vs flat oracle, exactness at full probe.

SURVEY.md §4 test strategy: recall@k integration tests on small corpora
vs exact search, on the 8-device CPU mesh.
"""

import numpy as np

from abstracts_search_tpu.index import FlatIndex
from abstracts_search_tpu.index.ivf import IVFFlatIndex
from abstracts_search_tpu.index.lists import pack_lists
from abstracts_search_tpu.parallel import build_mesh


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_pack_lists_roundtrip(rng):
    n, d, n_lists, ndev, seg = 500, 8, 16, 4, 32
    payloads = rng.standard_normal((n, d)).astype(np.float32)
    positions = np.arange(n, dtype=np.int64)
    assign = rng.integers(0, n_lists, n)

    packed = pack_lists(payloads, positions, assign, n_lists, ndev=ndev, seg_size=seg)
    assert packed.n_rows == n

    # every row is present exactly once, in its list, on the right device
    seen = {}
    for dev, dl in enumerate(packed.per_device):
        for l in range(n_lists):
            for s in dl.list_segs[l]:
                if s < 0:
                    continue
                assert l % ndev == dev
                lo = s * seg
                cnt = dl.seg_valid[s]
                for r in range(cnt):
                    pos = dl.row_ids[lo + r]
                    assert pos not in seen
                    seen[pos] = (dev, l)
                    np.testing.assert_array_equal(dl.data[lo + r], payloads[pos])
                    assert assign[pos] == l
                # padding rows are marked
                assert (dl.row_ids[lo + cnt : lo + seg] == -1).all()
    assert len(seen) == n


def test_ivf_recall_vs_flat(rng):
    n, d, k, n_lists = 4000, 32, 10, 32
    x = _normed(rng, n, d)
    q = _normed(rng, 32, d)

    mesh = build_mesh()
    flat = FlatIndex(mesh, chunk=128)
    flat.add(x)
    _, ref = flat.search(q, k)

    ivf = IVFFlatIndex(n_lists, mesh=mesh, seg_size=32, chunk=128, seed=0)
    ivf.train(x[:2000], iters=8)
    ivf.fill(x)
    assert ivf.n == n

    def recall(nprobe):
        _, got = ivf.search(q, k, nprobe=nprobe)
        return np.mean([
            len(set(got[i]) & set(ref[i])) / k for i in range(len(q))
        ])

    r4, r16, rall = recall(4), recall(16), recall(n_lists)
    assert rall > 0.999, rall          # probing everything == exact
    assert r16 >= r4 - 1e-9            # recall grows with nprobe
    assert r16 > 0.85, (r4, r16)


def test_ivf_positions_and_scores_valid(rng):
    n, d = 600, 16
    x = _normed(rng, n, d)
    ivf = IVFFlatIndex(8, mesh=build_mesh(), seg_size=16, chunk=128)
    ivf.train(x, iters=5)
    positions = np.arange(1000, 1000 + n, dtype=np.int64)  # non-trivial ids
    ivf.fill(x, positions)
    q = _normed(rng, 4, d)
    v, pos = ivf.search(q, 5, nprobe=8)
    assert (pos >= 1000).all() and (pos < 1000 + n).all()
    # scores match recomputed dot products at returned positions
    recomputed = np.einsum("qkd,qd->qk", x[pos - 1000], q)
    np.testing.assert_allclose(v, recomputed, rtol=1e-4, atol=1e-4)


def test_ivf_save_load_roundtrip(tmp_path, rng):
    n, d = 800, 16
    x = _normed(rng, n, d)
    mesh = build_mesh()
    ivf = IVFFlatIndex(8, mesh=mesh, seg_size=16, chunk=128)
    stats = ivf.train(x, iters=4)
    assert stats["k"] == 8
    ivf.fill(x)
    q = _normed(rng, 8, d)
    v1, p1 = ivf.search(q, 5, nprobe=8)

    ivf.save(tmp_path / "index")
    ivf2 = IVFFlatIndex.load(tmp_path / "index", mesh=mesh, chunk=128)
    v2, p2 = ivf2.search(q, 5, nprobe=8)
    np.testing.assert_allclose(v1, v2, atol=1e-6)
    np.testing.assert_array_equal(p1, p2)


def test_ivf_k_exceeding_candidates(rng):
    """k larger than the probed candidate pool: fill with -1/-inf."""
    x = _normed(rng, 40, 8)
    ivf = IVFFlatIndex(8, mesh=build_mesh(), seg_size=8, chunk=128)
    ivf.train(x, iters=3)
    ivf.fill(x)
    v, pos = ivf.search(_normed(rng, 2, 8), 30, nprobe=1)
    assert (pos[v == -np.inf] == -1).all()
    assert (pos[v > -np.inf] >= 0).all()
