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
