"""ADC scan kernel vs numpy and vs the XLA reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from abstracts_search_tpu.ops.adc import adc_scan_pallas, adc_scan_xla


def _ref(codes3, luts, seg_ids, q_ids):
    n_slots = len(seg_ids)
    seg = codes3.shape[1]
    m = codes3.shape[2]
    out = np.zeros((n_slots, seg), np.float32)
    for i in range(n_slots):
        codes = codes3[seg_ids[i]]
        lut = luts[q_ids[i]]
        for r in range(seg):
            out[i, r] = sum(lut[mm, codes[r, mm]] for mm in range(m))
    return out


@pytest.mark.parametrize("ksub,m", [(16, 8), (256, 4)])
def test_adc_scan_matches_reference(rng, ksub, m):
    # slots must be contiguous per query (the pallas grid is (Q, slots/Q))
    n_segs, seg, q, spq = 6, 16, 3, 4
    n_slots = q * spq
    codes3 = rng.integers(0, ksub, (n_segs, seg, m), dtype=np.uint8)
    luts = rng.standard_normal((q, m, ksub)).astype(np.float32)
    seg_ids = rng.integers(0, n_segs, n_slots).astype(np.int32)
    q_ids = np.repeat(np.arange(q, dtype=np.int32), spq)

    ref = _ref(codes3, luts, seg_ids, q_ids)
    got_xla = np.asarray(adc_scan_xla(
        jnp.asarray(codes3), jnp.asarray(luts), jnp.asarray(seg_ids), jnp.asarray(q_ids)))
    got_pl = np.asarray(adc_scan_pallas(
        jnp.asarray(codes3), jnp.asarray(luts), jnp.asarray(seg_ids), jnp.asarray(q_ids),
        interpret=True))

    np.testing.assert_allclose(got_xla, ref, rtol=1e-5, atol=1e-5)
    # pallas path accumulates the one-hot matvec in bf16 inputs/f32 acc
    np.testing.assert_allclose(got_pl, ref, rtol=2e-2, atol=2e-2)


def test_adc_scan_packed_nibbles_matches_unpacked(rng):
    """Nibble-packed 4-bit payloads (byte j = subspace 2j low, 2j+1
    high — the storage format that makes M x 4 bit a true M/2 bytes)
    must score identically to the unpacked layout, in both impls."""
    ksub, m = 16, 8
    n_segs, seg, q, spq = 6, 16, 3, 4
    n_slots = q * spq
    codes = rng.integers(0, ksub, (n_segs, seg, m), dtype=np.uint8)
    packed = codes[..., 0::2] | (codes[..., 1::2] << 4)     # [.., m/2]
    luts = rng.standard_normal((q, m, ksub)).astype(np.float32)
    seg_ids = rng.integers(0, n_segs, n_slots).astype(np.int32)
    q_ids = np.repeat(np.arange(q, dtype=np.int32), spq)

    ref = _ref(codes, luts, seg_ids, q_ids)
    got_xla = np.asarray(adc_scan_xla(
        jnp.asarray(packed), jnp.asarray(luts), jnp.asarray(seg_ids),
        jnp.asarray(q_ids)))
    got_pl = np.asarray(adc_scan_pallas(
        jnp.asarray(packed), jnp.asarray(luts), jnp.asarray(seg_ids),
        jnp.asarray(q_ids), interpret=True))

    np.testing.assert_allclose(got_xla, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_pl, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("ksub,m", [(16, 8), (256, 4)])
def test_adc_scan_transposed_matches_reference(rng, ksub, m):
    """Transposed [MB, SEG] payloads (the lane-compact production
    layout — lists.CSRLists) must score identically to row-major."""
    n_segs, seg, q, spq = 6, 16, 3, 4
    n_slots = q * spq
    codes = rng.integers(0, ksub, (n_segs, seg, m), dtype=np.uint8)
    if ksub == 16:
        wire = codes[..., 0::2] | (codes[..., 1::2] << 4)  # packed too
    else:
        wire = codes
    codes_t = np.ascontiguousarray(wire.transpose(0, 2, 1))  # [n_segs, MB, SEG]
    luts = rng.standard_normal((q, m, ksub)).astype(np.float32)
    seg_ids = rng.integers(0, n_segs, n_slots).astype(np.int32)
    q_ids = np.repeat(np.arange(q, dtype=np.int32), spq)

    ref = _ref(codes, luts, seg_ids, q_ids)
    got_xla = np.asarray(adc_scan_xla(
        jnp.asarray(codes_t), jnp.asarray(luts), jnp.asarray(seg_ids),
        jnp.asarray(q_ids), transposed=True))
    got_pl = np.asarray(adc_scan_pallas(
        jnp.asarray(codes_t), jnp.asarray(luts), jnp.asarray(seg_ids),
        jnp.asarray(q_ids), interpret=True, transposed=True))

    np.testing.assert_allclose(got_xla, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_pl, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("ksub,m", [(16, 8), (256, 4)])
def test_adc_topk_fused_matches_composed(rng, ksub, m):
    """Fused per-slot scan+top-k (the production path: the scores
    matrix never leaves the kernel) must equal adc_scan + mask + top_k
    composed, for both impls, on transposed payloads."""
    from abstracts_search_tpu.ops.adc import adc_topk_pallas, adc_topk_xla

    n_segs, seg, q, spq, kp = 6, 16, 3, 4, 5
    n_slots = q * spq
    codes = rng.integers(0, ksub, (n_segs, seg, m), dtype=np.uint8)
    wire = codes[..., 0::2] | (codes[..., 1::2] << 4) if ksub == 16 else codes
    codes_t = np.ascontiguousarray(wire.transpose(0, 2, 1))
    luts = rng.standard_normal((q, m, ksub)).astype(np.float32)
    seg_ids = rng.integers(0, n_segs, n_slots).astype(np.int32)
    q_ids = np.repeat(np.arange(q, dtype=np.int32), spq)
    valid = rng.integers(0, seg + 1, n_slots).astype(np.int32)

    ref_scores = _ref(codes, luts, seg_ids, q_ids)
    ref_scores[np.arange(seg)[None, :] >= valid[:, None]] = -np.inf
    order = np.argsort(-ref_scores, axis=1, kind="stable")[:, :kp]
    ref_v = np.take_along_axis(ref_scores, order, axis=1)

    for fn, tol in ((adc_topk_xla, 1e-5), (adc_topk_pallas, 2e-2)):
        kw = {"transposed": True}
        if fn is adc_topk_pallas:
            kw["interpret"] = True
        v, rows = fn(jnp.asarray(codes_t), jnp.asarray(luts),
                     jnp.asarray(seg_ids), jnp.asarray(q_ids),
                     jnp.asarray(valid), kp, **kw)
        v, rows = np.asarray(v), np.asarray(rows)
        np.testing.assert_allclose(v, ref_v, rtol=tol, atol=tol)
        # winners must point at genuinely valid rows with those scores
        live = np.isfinite(v)
        got = np.take_along_axis(ref_scores, rows, axis=1)
        np.testing.assert_allclose(got[live], v[live], rtol=tol, atol=tol)
        assert (rows[live] < valid[:, None].repeat(kp, 1)[live]).all()


@pytest.mark.parametrize("kp", [24, 64])
def test_adc_topk_fused_large_kp_fori_branch(rng, kp):
    """kp>16 takes the fori_loop select-write branch (a static unroll at
    kp>=64 overflows the Mosaic VMEM stack on chip — ADVICE r2); results
    must still match the composed oracle."""
    import jax.numpy as jnp

    from abstracts_search_tpu.ops.adc import adc_topk_pallas, adc_topk_xla

    ksub, m = 16, 8
    n_segs, seg, q, spq = 5, 128, 2, 3
    n_slots = q * spq
    codes = rng.integers(0, ksub, (n_segs, seg, m), dtype=np.uint8)
    wire = codes[..., 0::2] | (codes[..., 1::2] << 4)
    codes_t = np.ascontiguousarray(wire.transpose(0, 2, 1))
    luts = rng.standard_normal((q, m, ksub)).astype(np.float32)
    seg_ids = rng.integers(0, n_segs, n_slots).astype(np.int32)
    q_ids = np.repeat(np.arange(q, dtype=np.int32), spq)
    valid = rng.integers(kp, seg + 1, n_slots).astype(np.int32)

    ref_scores = _ref(codes, luts, seg_ids, q_ids)
    ref_scores[np.arange(seg)[None, :] >= valid[:, None]] = -np.inf
    order = np.argsort(-ref_scores, axis=1, kind="stable")[:, :kp]
    ref_v = np.take_along_axis(ref_scores, order, axis=1)

    for fn, tol in ((adc_topk_xla, 1e-5), (adc_topk_pallas, 2e-2)):
        kw = {"transposed": True}
        if fn is adc_topk_pallas:
            kw["interpret"] = True
        v, rows = fn(jnp.asarray(codes_t), jnp.asarray(luts),
                     jnp.asarray(seg_ids), jnp.asarray(q_ids),
                     jnp.asarray(valid), kp, **kw)
        v, rows = np.asarray(v), np.asarray(rows)
        np.testing.assert_allclose(v, ref_v, rtol=tol, atol=tol)
        got = np.take_along_axis(ref_scores, rows, axis=1)
        np.testing.assert_allclose(got, v, rtol=tol, atol=tol)
