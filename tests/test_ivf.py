"""IVF-Flat: packing, recall vs flat oracle, exactness at full probe.

SURVEY.md §4 test strategy: recall@k integration tests on small corpora
vs exact search, on the 8-device CPU mesh.
"""

import numpy as np

from abstracts_search_tpu.index import FlatIndex
from abstracts_search_tpu.index.ivf import IVFFlatIndex
from abstracts_search_tpu.index.lists import (
    load_lists,
    pack_lists,
    ragged_ranges,
    save_lists,
    shard_lists,
)
from abstracts_search_tpu.parallel import build_mesh


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_ragged_ranges(rng):
    starts = np.array([10, 0, 7])
    counts = np.array([3, 0, 2])
    vals, src = ragged_ranges(starts, counts)
    np.testing.assert_array_equal(vals, [10, 11, 12, 7, 8])
    np.testing.assert_array_equal(src, [0, 0, 0, 2, 2])


def test_pack_lists_csr_roundtrip(rng):
    n, d, n_lists, seg = 500, 8, 16, 32
    payloads = rng.standard_normal((n, d)).astype(np.float32)
    positions = np.arange(n, dtype=np.int64)
    assign = rng.integers(0, n_lists, n)

    csr = pack_lists(payloads, positions, assign, n_lists, seg_size=seg)
    assert csr.n_rows == n

    # every row present exactly once, in its list, CSR segments contiguous
    seen = {}
    for l in range(n_lists):
        for s in range(csr.seg_start[l], csr.seg_start[l] + csr.seg_cnt[l]):
            cnt = csr.seg_valid[s]
            for r in range(cnt):
                pos = csr.row_ids[s, r]
                assert pos not in seen
                seen[pos] = l
                np.testing.assert_array_equal(csr.data[s, r], payloads[pos])
                assert assign[pos] == l
            assert (csr.row_ids[s, cnt:] == -1).all()
    assert len(seen) == n

    # work-proportional invariant: total segments == sum(ceil(list/seg)),
    # NOT n_lists * max_segs
    counts = np.bincount(assign, minlength=n_lists)
    assert csr.n_segs == (-(-counts // seg)).sum()


def test_shard_lists_all_ndev_consistent(rng):
    """Sharding is a pure function of (csr, ndev): every row lands on
    device list_id % ndev exactly once, for ANY ndev (mesh portability,
    VERDICT.md round-1 weak #7)."""
    n, n_lists, seg = 700, 12, 16
    payloads = rng.integers(0, 255, (n, 4)).astype(np.uint8)
    positions = np.arange(n, dtype=np.int64)
    assign = rng.integers(0, n_lists, n)
    csr = pack_lists(payloads, positions, assign, n_lists, seg_size=seg)

    for ndev in (1, 2, 3, 8):
        sh = shard_lists(csr, ndev)
        assert sh.data.shape[0] == ndev
        seen = set()
        for dev in range(ndev):
            for l in range(n_lists):
                cnt = sh.seg_cnt[dev, l]
                if cnt == 0:
                    continue
                assert l % ndev == dev
                s0 = sh.seg_start[dev, l]
                for s in range(s0, s0 + cnt):
                    valid = sh.seg_valid[dev, s]
                    rows = sh.row_ids[dev, s, :valid]
                    assert not (set(rows.tolist()) & seen)
                    seen.update(rows.tolist())
                    np.testing.assert_array_equal(
                        sh.data[dev, s, :valid], payloads[rows]
                    )
        assert len(seen) == n, ndev


def test_lists_save_load_memmap(tmp_path, rng):
    n, n_lists, seg = 300, 8, 16
    payloads = rng.integers(0, 255, (n, 4)).astype(np.uint8)
    csr = pack_lists(payloads, np.arange(n), rng.integers(0, n_lists, n),
                     n_lists, seg_size=seg)
    save_lists(csr, tmp_path / "lists")
    back = load_lists(tmp_path / "lists", mmap=True)
    assert isinstance(back.data, np.memmap)
    np.testing.assert_array_equal(np.asarray(back.data), csr.data)
    np.testing.assert_array_equal(np.asarray(back.row_ids), csr.row_ids)
    np.testing.assert_array_equal(back.seg_valid, csr.seg_valid)
    np.testing.assert_array_equal(back.seg_start, csr.seg_start)
    np.testing.assert_array_equal(back.seg_cnt, csr.seg_cnt)
    assert back.n_rows == n and back.seg_size == seg


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


def test_ivf_plain_l2_exact_ranking(rng):
    """spherical=False serves EXACT plain-L2 search (round-4 VERDICT
    weak #6 / next #6): high-norm decoys that dominate inner-product
    ranking must lose to true L2 neighbors."""
    n, d = 2048, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    # decoys: huge-norm rows — the IP winner for nearly every query,
    # but L2-far from everything
    x[:64] *= 50.0
    idx = IVFFlatIndex(16, mesh=build_mesh(), spherical=False,
                       seg_size=32, chunk=128, seed=0)
    idx.train(x[:1024], iters=6)
    idx.fill(x)

    q = x[200:216] + 0.01 * rng.standard_normal((16, d)).astype(np.float32)
    v, pos = idx.search(q, 10, nprobe=16)   # full probe -> exact
    d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    want = np.argsort(d2, axis=1, kind="stable")[:, :10]
    # full-probe L2 top-1 must be the true L2 NN (not an IP decoy)
    np.testing.assert_array_equal(pos[:, 0], want[:, 0])
    # and the top-10 sets match the exact L2 oracle
    for i in range(16):
        assert set(pos[i].tolist()) == set(want[i].tolist())
    # scores are q.x - ||x||^2/2: monotone in -L2 per query
    for i in range(16):
        got_d2 = d2[i][pos[i]]
        assert (np.diff(got_d2) >= -1e-3).all()


def test_ivf_plain_l2_save_load(tmp_path, rng):
    n, d = 512, 16
    x = rng.standard_normal((n, d)).astype(np.float32) * 3.0
    idx = IVFFlatIndex(8, mesh=build_mesh(), spherical=False,
                       seg_size=32, chunk=128, seed=0)
    idx.train(x, iters=4)
    idx.fill(x)
    v0, p0 = idx.search(x[:8], 5, nprobe=8)
    idx.save(tmp_path / "l2")
    idx2 = IVFFlatIndex.load(tmp_path / "l2", mesh=build_mesh())
    assert idx2.spherical is False
    v1, p1 = idx2.search(x[:8], 5, nprobe=8)
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_allclose(v0, v1, rtol=1e-5)


def test_ivf_plain_l2_partial_probe_high_norm(rng):
    """Plain-L2 at PARTIAL nprobe on high-norm data: assignment and
    probe both select through the ||c||^2/2 bias, whose magnitude
    (~1.6e5 here) would swamp bf16's quantization step (~magnitude/256
    > inter-centroid gaps) — the augmented matmuls must run f32
    (round-5 review finding; the full-probe test above cannot see
    mis-probes because every list is scanned)."""
    n_lists, d, per = 16, 32, 128
    centers = rng.standard_normal((n_lists, d)).astype(np.float32) * 20.0
    centers += 100.0                      # ||c|| ~ 565: bias ~ -1.6e5
    x = np.concatenate([
        c + 0.5 * rng.standard_normal((per, d)).astype(np.float32)
        for c in centers])
    idx = IVFFlatIndex(n_lists, mesh=build_mesh(), spherical=False,
                       seg_size=32, chunk=128, seed=0)
    idx.train(x, iters=8)
    idx.fill(x)

    q = x[::per][:16] + 0.05 * rng.standard_normal((16, d)).astype(np.float32)
    v, pos = idx.search(q, 10, nprobe=2)  # partial probe
    d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    want = np.argsort(d2, axis=1, kind="stable")[:, :10]
    # clusters are well separated: a correct L2 probe finds the true
    # NN's list, so recall@10 is ~1; a bf16-biased probe mis-ranks lists
    hits = sum(len(set(pos[i].tolist()) & set(want[i].tolist()))
               for i in range(16))
    assert hits >= 0.95 * 16 * 10, f"recall@10 {hits / 160:.3f}"
    np.testing.assert_array_equal(pos[:, 0], want[:, 0])


def test_ivfpq_refuses_plain_l2():
    """IVFPQ's ADC scan is IP-ranked; without -N it must fail loudly
    (round-4 VERDICT weak #6), pointing at IVFFlatIndex."""
    import pytest

    from abstracts_search_tpu.index.ivfpq import IVFPQIndex

    with pytest.raises(ValueError, match="IVFFlatIndex"):
        IVFPQIndex(8, 16, spherical=False)


def test_ivfpq_legacy_unnormalized_artifact_still_loads(tmp_path, caplog):
    """An index BUILT by pre-round-5 code with -N absent (meta records
    spherical=false) must still open — refusing at load would brick a
    deployed artifact with a train-time message no rebuild-less action
    can fix (round-5 review finding). It serves with the semantics it
    was built/tuned with, plus a loud warning."""
    import json
    import logging

    import pytest

    from abstracts_search_tpu.index.ivfpq import IVFPQIndex

    rng = np.random.default_rng(0)
    x = rng.standard_normal((512, 32)).astype(np.float32)
    idx = IVFPQIndex(8, 32, pq_m=4, pq_nbits=8, use_opq=False,
                     mesh=build_mesh(), seg_size=32, chunk=128)
    idx.train(x, kmeans_iters=3, pq_iters=3)
    idx.fill(x)
    idx.save(tmp_path / "art")
    meta_p = tmp_path / "art" / "meta.json"
    meta = json.loads(meta_p.read_text())
    meta["spherical"] = False             # what pre-round-5 builds wrote
    meta_p.write_text(json.dumps(meta))

    with caplog.at_level(logging.WARNING):
        idx2 = IVFPQIndex.load(tmp_path / "art", mesh=build_mesh())
    assert idx2.spherical is False
    assert any("without -N" in r.message for r in caplog.records)
    v, pos = idx2.search(x[:4], 5, nprobe=8)
    assert pos.shape == (4, 5) and (pos >= 0).all()
    # direct construction still refuses: only load() grandfathers
    with pytest.raises(ValueError, match="IVFFlatIndex"):
        IVFPQIndex(8, 32, spherical=False)
    # ...and only for SERVING: building new data under the refused
    # semantics must still fail loudly
    with pytest.raises(ValueError, match="serve-only"):
        idx2.train(x)
    with pytest.raises(ValueError, match="serve-only"):
        idx2.fill(x)
