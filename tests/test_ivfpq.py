"""OPQ+IVF-PQ: recall vs flat oracle, ADC exactness, artifacts roundtrip."""

import numpy as np

from abstracts_search_tpu.index import FlatIndex
from abstracts_search_tpu.index.ivfpq import IVFPQIndex
from abstracts_search_tpu.parallel import build_mesh


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _queries_near(rng, x, nq, noise=0.15):
    """Perturbed corpus rows: random data has no neighbor structure, so
    recall on pure-random queries mostly measures tie-breaking under
    quantization noise. Near-duplicate queries give a meaningful
    ground truth (their true neighbors are well separated)."""
    picks = rng.choice(len(x), nq, replace=False)
    q = x[picks] + noise * rng.standard_normal((nq, x.shape[1])).astype(np.float32)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def _recall(got, ref):
    k = ref.shape[1]
    return np.mean([len(set(got[i]) & set(ref[i])) / k for i in range(len(ref))])


def test_ivfpq_recall_vs_flat(rng):
    """1-recall@10: the true nearest neighbor must surface in the top 10.

    (Overlap-recall@10 on isotropic random vectors mostly measures
    tie-breaking among near-equal scores under quantization noise —
    at ~2 bits/dim it sits near 0.55 for ANY correct PQ implementation,
    so the meaningful synthetic check is finding the one well-separated
    neighbor.)
    """
    n, d, k = 5000, 64, 10
    x = _normed(rng, n, d)
    q = _queries_near(rng, x, 32)

    mesh = build_mesh()
    flat = FlatIndex(mesh, chunk=128)
    flat.add(x)
    _, ref = flat.search(q, k)
    true_nn = ref[:, 0]

    idx = IVFPQIndex(
        16, d, pq_m=16, pq_nbits=8, use_opq=True,
        mesh=mesh, seg_size=64, chunk=128, seed=0,
    )
    stats = idx.train(x[:3000], kmeans_iters=8, opq_iters=2, pq_iters=8)
    assert stats["pq_m"] == 16
    idx.fill(x)
    assert idx.n == n

    def recall1_at10(nprobe):
        _, got = idx.search(q, k, nprobe=nprobe)
        return np.mean([true_nn[i] in got[i] for i in range(len(q))])

    r_all = recall1_at10(16)
    r_4 = recall1_at10(4)
    assert r_all > 0.9, r_all
    assert r_4 > 0.5, r_4
    # overlap-recall grows with nprobe
    o_4 = _recall(idx.search(q, k, nprobe=4)[1], ref)
    o_all = _recall(idx.search(q, k, nprobe=16)[1], ref)
    assert o_4 <= o_all + 1e-9


def test_ivfpq_adc_matches_reconstruction(rng):
    """ADC score == q . (centroid + decode(code)) exactly."""
    n, d = 1200, 32
    x = _normed(rng, n, d)
    q = _normed(rng, 6, d)
    mesh = build_mesh()
    idx = IVFPQIndex(8, d, pq_m=8, pq_nbits=4, use_opq=False,
                     mesh=mesh, seg_size=32, chunk=128, seed=1)
    idx.train(x, kmeans_iters=6, pq_iters=6)
    idx.fill(x)

    v, pos = idx.search(q, 5, nprobe=8)
    assign, codes = idx.encode(x)
    recon = idx.kmeans.centroids[assign] + idx.pq.decode(codes)  # rotated space
    qr = q @ idx.rotation
    expected = np.einsum("qkd,qd->qk", recon[pos], qr)
    np.testing.assert_allclose(v, expected, rtol=1e-4, atol=1e-4)


def test_ivfpq_opq_no_opq_both_work(rng):
    n, d = 2000, 32
    x = _normed(rng, n, d)
    q = _queries_near(rng, x, 16)
    mesh = build_mesh()
    flat = FlatIndex(mesh, chunk=128)
    flat.add(x)
    _, ref = flat.search(q, 10)

    for use_opq in (False, True):
        idx = IVFPQIndex(8, d, pq_m=8, pq_nbits=8, use_opq=use_opq,
                         mesh=mesh, seg_size=32, chunk=128, seed=0)
        idx.train(x, kmeans_iters=6, opq_iters=2, pq_iters=6)
        idx.fill(x)
        r = _recall(idx.search(q, 10, nprobe=8)[1], ref)
        # overlap-recall on isotropic random data sits near the code's
        # information limit; the check is "clearly better than chance"
        assert r > 0.5, (use_opq, r)


def test_ivfpq_save_load(tmp_path, rng):
    n, d = 1000, 16
    x = _normed(rng, n, d)
    mesh = build_mesh()
    idx = IVFPQIndex(4, d, pq_m=4, pq_nbits=4, use_opq=True,
                     mesh=mesh, seg_size=32, chunk=128)
    idx.train(x, kmeans_iters=4, opq_iters=2, pq_iters=4)
    idx.fill(x)
    q = _normed(rng, 4, d)
    v1, p1 = idx.search(q, 5, nprobe=4)

    idx.save(tmp_path / "ivfpq")
    idx2 = IVFPQIndex.load(tmp_path / "ivfpq", mesh=mesh, chunk=128)
    v2, p2 = idx2.search(q, 5, nprobe=4)
    np.testing.assert_allclose(v1, v2, atol=1e-6)
    np.testing.assert_array_equal(p1, p2)

    # trained-but-unfilled artifact (the empty.faiss analog)
    idx.save(tmp_path / "empty", include_lists=False)
    idx3 = IVFPQIndex.load(tmp_path / "empty", mesh=mesh, chunk=128)
    assert idx3.is_trained and idx3.packed is None
    idx3.fill(x)
    v3, p3 = idx3.search(q, 5, nprobe=4)
    np.testing.assert_array_equal(p1, p3)


def test_ivfpq_memory_budget(rng):
    """Packed payload is ~M bytes/vector (the PQ point, SURVEY.md §6)."""
    n, d, m = 4096, 32, 8
    x = _normed(rng, n, d)
    idx = IVFPQIndex(8, d, pq_m=m, pq_nbits=8, use_opq=False,
                     mesh=build_mesh(), seg_size=128, chunk=128)
    idx.train(x[:2000], kmeans_iters=4, pq_iters=4)
    idx.fill(x)
    # padding overhead bounded: < 3x ideal at this tiny scale, and
    # payload dtype is uint8 (1 byte/code)
    assert idx.packed.data.dtype == np.uint8
    assert idx.packed.data.nbytes < 3 * n * m
    # CSR metadata is O(n_lists), not O(n_lists * max_segs)
    assert idx.packed.seg_start.shape == (8,)
    assert idx.packed.seg_cnt.shape == (8,)


def test_speculative_scan_equivalence(rng):
    """The speculatively dispatched scan (shape from a previous search)
    must return exactly the non-speculative results, including after a
    forced mispredict (spec shape too small -> validated, re-scanned)."""
    n, d = 3000, 16
    x = _normed(rng, n, d)
    q = _queries_near(rng, x, 12, noise=0.05)
    idx = IVFPQIndex(16, d, pq_m=4, pq_nbits=4, use_opq=False,
                     mesh=build_mesh(), seg_size=32, chunk=128, seed=0,
                     scan_impl="map")
    idx.train(x, kmeans_iters=4, pq_iters=4)
    idx.fill(x)

    v0, p0 = idx.search(q, 5, nprobe=4)
    assert idx.last_scan_stats["spec"] == "cold"
    v1, p1 = idx.search(q, 5, nprobe=4)
    assert idx.last_scan_stats["spec"] == "hit"
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_allclose(v0, v1, rtol=1e-6)

    # force a mispredict: pretend the last batch needed almost nothing
    idx._spec_shapes[(12, 4)] = (8, 1)
    v2, p2 = idx.search(q, 5, nprobe=4)
    assert idx.last_scan_stats["spec"] == "miss"
    np.testing.assert_array_equal(p0, p2)
    np.testing.assert_allclose(v0, v2, rtol=1e-6)
    # the miss re-learned the real shape
    assert idx._spec_shapes[(12, 4)][0] >= idx.last_scan_stats["bucket"]

    # a different batch size is a separate speculative entry
    v3, p3 = idx.search(q[:4], 5, nprobe=4)
    assert idx.last_scan_stats["spec"] == "cold"
    np.testing.assert_array_equal(p3, p0[:4])


def test_fused_scan_transfer_is_integer_typed(rng):
    """The fused scan->host transfer must ride an INTEGER dtype.

    TPU vector units flush f32 denormals to zero in copy/fusion paths;
    top-k positions bitcast into f32 lanes are denormals (values <
    2^24), so packing the result as f32 silently zeroed positions on
    chip while CPU (which preserves denormals) stayed green. Structural
    regression guard for the int32 packing in IVFPQIndex._build_scan.
    """
    import jax.numpy as jnp

    n, d = 2048, 32
    x = _normed(rng, n, d)
    idx = IVFPQIndex(8, d, pq_m=8, pq_nbits=8, use_opq=False,
                     mesh=build_mesh(), seg_size=32, chunk=128, seed=0)
    idx.train(x[:1024], kmeans_iters=3, opq_iters=1, pq_iters=3)
    idx.fill(x)
    q = x[:4]
    idx.search(q, 5, nprobe=4)

    scan_keys = [key for key in idx._search_cache if key[0] == "scan"]
    assert scan_keys, "search must have compiled a fused scan"
    _, qn, k, nprobe, bucket, maxcnt = scan_keys[-1]
    qp = np.zeros((qn, d), np.float32)
    qp[: len(q)] = q
    probes, bias, luts, _ = idx._search_cache[("probe_csr", qn, nprobe)](
        jnp.asarray(qp), idx._rot_dev, idx._centroids_dev,
        idx._pq_cent_dev, idx._csr_dev[1])
    flat = idx._search_cache[scan_keys[-1]](
        probes, bias, luts, *idx._dev_arrays, *idx._csr_dev)
    assert jnp.issubdtype(flat.dtype, jnp.integer), flat.dtype


def test_ivfpq_4bit_codes_are_nibble_packed(rng, tmp_path):
    """The default fastscan-style config (M x 4 bit) must STORE M/2
    bytes per vector — the faiss 64 B/vector memory budget is a parity
    claim, not just a logical one — and survive an artifact roundtrip."""
    n, d, m = 3000, 32, 8
    x = _normed(rng, n, d)
    q = _queries_near(rng, x, 8)
    idx = IVFPQIndex(8, d, pq_m=m, pq_nbits=4, use_opq=False,
                     mesh=build_mesh(), seg_size=32, chunk=128, seed=0)
    idx.train(x, kmeans_iters=4, pq_iters=4)
    idx.fill(x)
    assert idx.code_bytes == m // 2
    # transposed segment blocks: [MB, SEG] (lists.CSRLists)
    assert idx.packed.transposed
    assert idx.packed.data.shape[1] == m // 2

    v1, p1 = idx.search(q, 5, nprobe=8)
    idx.save(tmp_path / "art")
    idx2 = IVFPQIndex.load(tmp_path / "art")
    assert idx2.packed.transposed
    assert idx2.packed.data.shape[1] == m // 2
    v2, p2 = idx2.search(q, 5, nprobe=8)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-6)


def test_search_query_split_matches_unsplit(rng, monkeypatch):
    """Oversized qn*nprobe batches split recursively (the slot arrays
    ride SMEM scalar-prefetch, 1 MB on v5e: a 256q x nprobe=256 tune
    point overflowed it at 8.4M rows). Split results must equal the
    unsplit scan's."""
    n, d = 3000, 32
    x = _normed(rng, n, d)
    q = _queries_near(rng, x, 24)
    idx = IVFPQIndex(8, d, pq_m=8, pq_nbits=8, use_opq=False,
                     mesh=build_mesh(), seg_size=64, chunk=128, seed=0)
    idx.train(x[:2000], kmeans_iters=4, pq_iters=4)
    idx.fill(x)

    v_ref, p_ref = idx.search(q, 5, nprobe=8)      # 24*8=192 < cap
    monkeypatch.setattr(IVFPQIndex, "SEARCH_QP_MAX", 48)  # force 4-way split
    v_sp, p_sp = idx.search(q, 5, nprobe=8)
    np.testing.assert_array_equal(p_ref, p_sp)
    np.testing.assert_allclose(v_ref, v_sp, rtol=1e-5, atol=1e-5)


def test_fused_steady_state_matches_two_step(rng):
    """Steady-state searches fuse probe+scan into one dispatch (one
    RPC instead of two per batch); results must equal the two-step
    path exactly, and a shape-busting batch must still fall back
    through the miss path correctly."""
    n, d = 4000, 32
    x = _normed(rng, n, d)
    q = _queries_near(rng, x, 16)
    idx = IVFPQIndex(16, d, pq_m=8, pq_nbits=4, use_opq=False,
                     mesh=build_mesh(), seg_size=32, chunk=128, seed=0)
    idx.train(x[:2000], kmeans_iters=5, pq_iters=5)
    idx.fill(x)

    v1, p1 = idx.search(q, 6, nprobe=4)       # cold: two-step, sets spec
    assert idx.last_scan_stats["fused"] is False
    v2, p2 = idx.search(q, 6, nprobe=4)       # steady: fused
    assert idx.last_scan_stats["fused"] is True
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6, atol=1e-7)

    # force a spec miss inside the fused path: shrink the remembered
    # shape so the speculative dispatch under-allocates
    key = (len(q), 4)
    idx._spec_shapes[key] = (8, 1)
    v3, p3 = idx.search(q, 6, nprobe=4)
    assert idx.last_scan_stats["spec"] == "miss"
    np.testing.assert_array_equal(p1, p3)


def test_wide_merge_rounds_match_topk(rng, monkeypatch):
    """Wide per-query merges (maxcnt*kp >= MERGE_ROUNDS_MIN_WIDTH) use
    k rounds of max/argmax/mask instead of sort-based lax.top_k; both
    must agree exactly (ties break lowest-index-first in both)."""
    n, d = 6000, 32
    x = _normed(rng, n, d)
    q = _queries_near(rng, x, 8)
    # 4 lists, probe all, seg 32, ONE-device mesh (maxcnt is per
    # device) -> ~190 slots/query -> maxcnt 256, width 256*8 = 2048:
    # crosses the rounds threshold
    import jax

    idx = IVFPQIndex(4, d, pq_m=8, pq_nbits=4, use_opq=False,
                     mesh=build_mesh(jax.devices()[:1]), seg_size=32,
                     chunk=128, seed=0)
    idx.train(x[:2000], kmeans_iters=4, pq_iters=4)
    idx.fill(x)

    v1, p1 = idx.search(q, 8, nprobe=4)
    st = idx.last_scan_stats
    assert st["maxcnt"] * 8 >= IVFPQIndex.MERGE_ROUNDS_MIN_WIDTH, st

    monkeypatch.setattr(IVFPQIndex, "MERGE_ROUNDS_MIN_WIDTH", 1 << 30)
    idx._search_cache.clear()
    v2, p2 = idx.search(q, 8, nprobe=4)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6, atol=1e-7)


def test_spec_headroom_small_batches(rng, monkeypatch):
    """Interactive shapes (qn <= SPEC_HEADROOM_MAX_QN) record the
    speculative scan shape one ladder rung ABOVE the observed need, so
    batch-to-batch slot fluctuation rides one compiled program instead
    of compiling a fresh rung per new high-water mark (a 5-15 s serving
    tail spike each through the remote tunnel at production scale)."""
    from abstracts_search_tpu.index.lists import bucket_size

    n, d = 3000, 16
    x = _normed(rng, n, d)
    q = _queries_near(rng, x, 12, noise=0.05)
    idx = IVFPQIndex(16, d, pq_m=4, pq_nbits=4, use_opq=False,
                     mesh=build_mesh(), seg_size=32, chunk=128, seed=0,
                     scan_impl="map")
    idx.train(x, kmeans_iters=4, pq_iters=4)
    idx.fill(x)

    idx.search(q, 5, nprobe=4)
    st = idx.last_scan_stats
    key = (12, 4)
    spec_b, spec_m = idx._spec_shapes[key]
    # the dispatched cold shape already carries the headroom rung
    assert spec_b == st["bucket"] and spec_m == st["maxcnt"]
    # a fluctuation below the padded rung is a HIT (no new program)
    idx.search(_queries_near(rng, x, 12, noise=0.05), 5, nprobe=4)
    assert idx.last_scan_stats["spec"] == "hit"
    # headroom'd keys never shrink
    for _ in range(17):
        idx.search(q, 5, nprobe=4)
    assert idx._spec_shapes[key] == (spec_b, spec_m)

    # throughput shapes (qn > threshold) keep the exact ladder
    monkeypatch.setattr(IVFPQIndex, "SPEC_HEADROOM_MAX_QN", 4)
    idx2 = IVFPQIndex(16, d, pq_m=4, pq_nbits=4, use_opq=False,
                      mesh=build_mesh(), seg_size=32, chunk=128, seed=0,
                      scan_impl="map")
    idx2.train(x, kmeans_iters=4, pq_iters=4)
    idx2.fill(x)
    idx2.search(q, 5, nprobe=4)
    nb = idx2.last_scan_stats["bucket"]
    assert idx2._spec_shapes[key][0] == nb == bucket_size(nb)
