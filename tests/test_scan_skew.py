"""Work-proportional scan: zipfian list sizes must not tax every query.

Round-1 VERDICT missing #1: the padded [n_lists, max_segs] probe table
made every query pay nprobe * max_segs slots, so one hot list destroyed
QPS at production scale. The CSR slot build expands exactly
sum(seg_cnt[probed lists]) slots, padded only to the batch's slot
bucket (~1.25x ladder) — faiss's scan-cost-proportional-to-list-length
property (SURVEY.md §2 #11).
"""

import numpy as np

from abstracts_search_tpu.index.ivfpq import IVFPQIndex, _next_pow2
from abstracts_search_tpu.index.lists import bucket_size
from abstracts_search_tpu.parallel import build_mesh


def _fake_index(seg_cnt: np.ndarray) -> IVFPQIndex:
    """Index shell with hand-built CSR metadata (slot build only)."""
    n_lists = len(seg_cnt)
    idx = IVFPQIndex(n_lists, 16, pq_m=4, pq_nbits=4, use_opq=False,
                     mesh=build_mesh(), seg_size=32, chunk=128)
    starts = np.concatenate([[0], np.cumsum(seg_cnt)])[:-1]
    idx._seg_start_h = starts[None].astype(np.int64)
    idx._seg_cnt_h = seg_cnt[None].astype(np.int64)
    return idx


def test_slot_build_skips_unprobed_hot_list():
    """Queries that do NOT probe the hot list pay nothing for it."""
    seg_cnt = np.full(64, 4, np.int64)
    seg_cnt[3] = 400  # one zipfian-hot list, 100x the mean
    idx = _fake_index(seg_cnt)

    qn, nprobe = 16, 8
    rng = np.random.default_rng(0)
    cold_lists = np.setdiff1d(np.arange(64), [3])
    probes = rng.choice(cold_lists, size=(qn, nprobe), replace=True)

    seg_ids, q_ids, slot_pair, soq, bucket, maxcnt = idx._build_slots(probes, nprobe)
    live = int((slot_pair >= 0).sum())
    assert live == qn * nprobe * 4                     # exactly the probed segs
    assert bucket == bucket_size(live)                 # ladder padding only
    # the old layout would scan qn * nprobe * max_segs = 16*8*400 = 51200
    assert live <= bucket <= int(live * 1.25) + 8 < 2048
    assert maxcnt == _next_pow2(nprobe * 4)


def test_bucket_ladder_properties():
    # monotone, >= v, and within ~25% + alignment of v
    prev = 0
    for v in [1, 7, 8, 9, 100, 1000, 12345, 1 << 20]:
        b = bucket_size(v)
        assert b >= max(v, 8) and b % 8 == 0 or b == 8
        assert b <= int(max(v, 8) * 1.25) + 8, (v, b)
        assert b >= prev or v < prev
        prev = b
    # idempotent: every ladder value maps to itself
    for v in [8, 16, 24, 32, 40, 56, 72, 96, 120, 152]:
        assert bucket_size(bucket_size(v)) == bucket_size(v)


def test_slot_build_charges_only_probing_queries():
    """Only the query that probes the hot list pays its segments."""
    seg_cnt = np.full(64, 2, np.int64)
    seg_cnt[0] = 200
    idx = _fake_index(seg_cnt)

    qn, nprobe = 8, 4
    probes = np.full((qn, nprobe), 10, np.int64)
    probes[0, 0] = 0  # only query 0 probes the hot list
    # give each query distinct cold lists so counts are predictable
    for i in range(qn):
        probes[i, 1:] = [11, 12, 13]

    seg_ids, q_ids, slot_pair, soq, bucket, maxcnt = idx._build_slots(probes, nprobe)
    live = int((slot_pair >= 0).sum())
    assert live == (qn * nprobe * 2) + (200 - 2)       # hot list once
    # per-query table: query 0 rags out to 200+6 slots, others 8
    q0 = int((soq[0, 0] >= 0).sum())
    q1 = int((soq[0, 1] >= 0).sum())
    assert q0 == 206 and q1 == 8


def test_skewed_fill_search_end_to_end(rng):
    """Zipfian corpus: results must stay exact vs the xla ADC reference
    and scan work must track actual probed rows."""
    d, n_lists = 16, 16
    # 2400 rows in one tight cluster + 600 spread out
    hot = 0.02 * rng.standard_normal((2400, d)).astype(np.float32)
    hot[:, 0] += 1.0
    cold = rng.standard_normal((600, d)).astype(np.float32)
    x = np.concatenate([hot, cold])
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    idx = IVFPQIndex(n_lists, d, pq_m=4, pq_nbits=4, use_opq=False,
                     mesh=build_mesh(), seg_size=32, chunk=128, seed=0,
                     scan_impl="map")
    idx.train(x, kmeans_iters=5, pq_iters=4)
    idx.fill(x)
    # confirm the fill is actually skewed
    assert idx.packed.seg_cnt.max() >= 4 * max(1, int(np.median(idx.packed.seg_cnt)))

    q_cold = cold[:8] / np.linalg.norm(cold[:8], axis=1, keepdims=True)
    v1, p1 = idx.search(q_cold, 5, nprobe=2)
    cold_work = idx.last_scan_stats["live_slots"]

    q_hot = hot[:8] / np.linalg.norm(hot[:8], axis=1, keepdims=True)
    v2, p2 = idx.search(q_hot, 5, nprobe=2)
    hot_work = idx.last_scan_stats["live_slots"]

    # hot-cluster queries pay for the big lists; cold queries must not
    assert hot_work > 2 * cold_work, (hot_work, cold_work)

    # results agree with the pallas(interpret) ADC path
    idx.scan_impl = "slots"
    idx._search_cache.clear()
    v3, p3 = idx.search(q_cold, 5, nprobe=2)
    np.testing.assert_allclose(v3, v1, rtol=2e-2, atol=2e-2)
    agree = np.mean([len(set(p3[i]) & set(p1[i])) / 5 for i in range(8)])
    assert agree > 0.9, agree
