"""Pallas ADC list-scan kernel — the IVF-PQ query hot loop.

Replaces the faiss ADC lookup-table scan (SURVEY.md §2 #11; §7 step 8
"the heart") with a TPU formulation. The XLA gather path works but TPUs
hate per-element gathers; this kernel turns the LUT lookup into
vectorized compare + MXU matvec:

For one *slot* = (query q, probed segment s):
  codes tile  [SEG, M] uint8   (DMA'd from the packed lists by a
                                scalar-prefetched segment id — the
                                block-sparse pallas idiom)
  lut         [M, ksub] f32    (per-query residual LUT, DMA'd by q id)

  rep     = repeat(codes, ksub, axis=1)            # [SEG, M*ksub]
  pattern = lane_iota % ksub                       # code value per lane
  onehot  = (rep == pattern)                       # ONE vector compare
  score   = onehot @ lut.flat                      # ONE MXU matvec

With 4-bit codes (ksub=16, the fastscan-style TPU-native config) the
compare width is M*16 lanes — a [SEG, 2048] op per slot; with 8-bit
codes the M axis is chunked so compare tiles stay <= ~4096 lanes.

The kernel only produces raw per-slot scores [n_slots, SEG]; bias
(q . c_list), validity masking and the top-k merge stay in XLA where
they fuse fine — the gather was the hard part.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mchunk(m: int, ksub: int) -> int:
    return max(1, min(m, 4096 // ksub))


def _adc_kernel(seg_ids, q_ids, codes_ref, lut_ref, out_ref, *, seg, m, ksub):
    del seg_ids, q_ids  # consumed by the index_maps
    codes = codes_ref[0].astype(jnp.int32)          # [SEG, M]
    mc = _mchunk(m, ksub)
    n_ch = m // mc

    acc = jnp.zeros((seg, 1), jnp.float32)
    for ch in range(n_ch):
        # pltpu.repeat TILES the block: lane j holds codes[:, j % mc],
        # so lane j encodes (code value c = j // mc, subspace = j % mc)
        rep = pltpu.repeat(codes[:, ch * mc : (ch + 1) * mc], ksub, axis=1)
        pattern = lax.broadcasted_iota(jnp.int32, (seg, mc * ksub), 1) // mc
        onehot = (rep == pattern).astype(jnp.float32)
        # luts arrive pre-flattened value-major: lut_ref[0, ch, c*mc + ml]
        # == lut[ch*mc + ml, c] — matches the lane encoding above.
        # (Mosaic can't reshape across lanes in-kernel, and a [L, 1]
        # matvec RHS is unsupported, so: multiply + lane-reduce.)
        lutrow = lut_ref[0, ch : ch + 1, :]         # [1, mc*ksub]
        acc += jnp.sum(onehot * lutrow, axis=1, keepdims=True)
    out_ref[0, 0, :] = acc[:, 0]


def adc_scan_pallas(codes3, luts, seg_ids, q_ids, *, interpret=None):
    """Per-slot ADC scores.

    codes3:  [n_segs, SEG, M] uint8 packed list payloads
    luts:    [Q, M, ksub] f32 per-query LUTs
    seg_ids: [n_slots] int32 segment per slot (pre-clamped to valid range)
    q_ids:   [n_slots] int32 LUT (query) per slot. Keep slots of one
             query CONTIGUOUS: pallas skips the LUT re-DMA whenever the
             block index repeats between consecutive grid steps, so a
             query-major slot order fetches each LUT once, not per slot.
             The slot list may be ragged per query (work-proportional
             scan) — dead padding slots should reuse the last live
             query id for the same reason.
    returns: [n_slots, SEG] f32 raw ADC sums
    """
    n_segs, seg, m = codes3.shape
    q, m2, ksub = luts.shape
    assert m == m2
    n_slots = seg_ids.shape[0]
    assert q_ids.shape == (n_slots,)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # pre-flatten LUTs value-major per m-chunk (in XLA, where reshapes
    # are free): luts_vm[q, ch, c*mc + ml] = luts[q, ch*mc + ml, c]
    mc = _mchunk(m, ksub)
    n_ch = m // mc
    luts_vm = (
        luts.astype(jnp.float32)
        .reshape(q, n_ch, mc, ksub)
        .transpose(0, 1, 3, 2)
        .reshape(q, n_ch, ksub * mc)
    )

    kernel = functools.partial(_adc_kernel, seg=seg, m=m, ksub=ksub)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_slots,),
        in_specs=[
            pl.BlockSpec(
                (1, seg, m), lambda i, sids, qids: (sids[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_ch, ksub * mc), lambda i, sids, qids: (qids[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        # 3-D output so the (sublane, lane) block dims are (1==full, seg):
        # Mosaic requires the last two block dims divide (8, 128) or
        # equal the array dims
        out_specs=pl.BlockSpec(
            (1, 1, seg), lambda i, sids, qids: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slots, 1, seg), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * seg * m * ksub,
            bytes_accessed=n_slots * (seg * m + seg * 4) + q * m * ksub * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seg_ids.astype(jnp.int32), q_ids.astype(jnp.int32), codes3, luts_vm)
    return out.reshape(n_slots, seg)


def adc_scan_xla(codes3, luts, seg_ids, q_ids):
    """XLA reference with identical semantics (gather-based)."""
    n_segs, seg, m = codes3.shape
    q, _, ksub = luts.shape
    codes = jnp.take(codes3, seg_ids, axis=0).astype(jnp.int32)       # [S, SEG, M]
    offs = (jnp.arange(m, dtype=jnp.int32) * ksub)[None, None, :]
    lut_flat = luts.reshape(q, m * ksub)
    lut_rows = jnp.take(lut_flat, q_ids, axis=0)                      # [S, M*ksub]
    vals = jnp.take_along_axis(
        lut_rows[:, None, :], codes + offs, axis=2
    )                                                                  # [S, SEG, M]
    return jnp.sum(vals, axis=-1)
