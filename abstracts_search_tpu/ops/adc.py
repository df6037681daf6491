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


def _is_packed(codes3, luts, transposed=False) -> bool:
    """Nibble-packed payloads: byte j of a code holds subspace 2j in its
    low nibble and 2j+1 in its high nibble (ksub must be 16). Detected
    by shape so legacy unpacked 4-bit artifacts keep working."""
    mb_axis = 1 if transposed else 2
    return (luts.shape[2] == 16
            and codes3.shape[mb_axis] * 2 == luts.shape[1])


def _adc_kernel_t(seg_ids, q_ids, codes_ref, lut_ref, out_ref, *,
                  seg, m, ksub, packed):
    """Transposed-payload variant: the codes tile is [MB, SEG] (one
    sublane per payload byte, one lane per row) — the layout whose HBM
    tiling is exact (see lists.CSRLists).

    Formulated as a VALUE loop (fori over the ksub code values, LUT
    column dynamically indexed per value): each iteration touches only
    [MB, SEG]-shaped buffers, so kernel VMEM stays ~1 MB regardless of
    ksub/seg. The earlier sublane one-hot EXPANSION ([mc*ksub, SEG]
    intermediates, statically unrolled chunks) measured 16.12M of
    scoped VMEM against the 16M stack limit at seg=1024 on chip — the
    same static-unroll stack overflow CLAUDE.md records for k>=64
    top-k unrolls. Same op count either way: sum_c (codes==c)*lut[c]."""
    del seg_ids, q_ids
    codes = codes_ref[0].astype(jnp.int32)          # [MB, SEG]
    mb = codes.shape[0]

    # Accumulate in the full [MB, SEG] shape and reduce over sublanes
    # ONCE after the value loop: reducing inside the loop costs a
    # 64->1 sublane reduction per code value (32 reductions/slot for
    # packed nibbles) and measured as the dominant per-slot cost at
    # 207M (~5-8 us/slot; the select-accumulate itself is ~16 cycles
    # per [64, 256] op).
    if packed:
        lo = codes & 0xF
        hi = codes >> 4

        def body(c, acc):
            acc += jnp.where(lo == c, lut_ref[0, c, 0], 0.0)  # [MB, SEG]
            acc += jnp.where(hi == c, lut_ref[0, c, 1], 0.0)
            return acc
    else:
        def body(c, acc):
            return acc + jnp.where(codes == c, lut_ref[0, c], 0.0)

    acc = lax.fori_loop(0, ksub, body, jnp.zeros((mb, seg), jnp.float32))
    out_ref[0, 0, :] = jnp.sum(acc, axis=0)


def _adc_kernel_packed4(seg_ids, q_ids, codes_ref, lut_ref, out_ref, *,
                        seg, mb, ksub):
    """Packed-nibble variant: the codes tile is [SEG, MB] uint8 carrying
    M = 2*MB 4-bit codes — half the DMA bytes of the unpacked tile (the
    scan is HBM-bound at production list sizes). Two compare passes per
    chunk (low nibbles, then high) against lane-reordered LUT halves."""
    del seg_ids, q_ids
    codes = codes_ref[0].astype(jnp.int32)          # [SEG, MB]
    mc = max(1, min(mb, 2048 // ksub))              # lanes/pass = mc*ksub
    n_ch = mb // mc
    lanes = mc * ksub

    acc = jnp.zeros((seg, 1), jnp.float32)
    for ch in range(n_ch):
        blk = codes[:, ch * mc : (ch + 1) * mc]
        pattern = lax.broadcasted_iota(jnp.int32, (seg, lanes), 1) // mc
        for half, nib in enumerate((blk & 0xF, blk >> 4)):
            rep = pltpu.repeat(nib, ksub, axis=1)   # lane l: nib[:, l % mc]
            onehot = (rep == pattern).astype(jnp.float32)
            # lut block is [1, n_ch, 2, ksub*mc]: indexing the size-2
            # half axis (not lane-slicing) keeps lanes whole — static
            # lane slices below 128 alignment are a Mosaic hazard
            lutrow = lut_ref[0, ch, half : half + 1, :]      # [1, lanes]
            acc += jnp.sum(onehot * lutrow, axis=1, keepdims=True)
    out_ref[0, 0, :] = acc[:, 0]


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


def adc_scan_pallas(codes3, luts, seg_ids, q_ids, *, interpret=None,
                    transposed=False):
    """Per-slot ADC scores.

    codes3:  [n_segs, SEG, M] uint8 packed list payloads
             (or [n_segs, MB, SEG] with transposed=True — the
             lane-compact production layout, lists.CSRLists)
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
    if transposed:
        n_segs, mbytes, seg = codes3.shape
    else:
        n_segs, seg, mbytes = codes3.shape
    q, m, ksub = luts.shape
    packed = _is_packed(codes3, luts, transposed)
    assert mbytes == (m // 2 if packed else m)
    n_slots = seg_ids.shape[0]
    assert q_ids.shape == (n_slots,)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if transposed:
        # value-major LUT columns for _adc_kernel_t's fori-over-values:
        # lut_vm[q, c, (half,) j, 0] = luts[q, subspace(j, half), c]
        lf = luts.astype(jnp.float32)
        if packed:
            luts_vm = (
                lf.reshape(q, mbytes, 2, ksub)
                .transpose(0, 3, 2, 1)
                .reshape(q, ksub, 2, mbytes, 1)
            )
            lut_spec = pl.BlockSpec(
                (1, ksub, 2, mbytes, 1),
                lambda i, sids, qids: (qids[i], 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            luts_vm = (
                lf.transpose(0, 2, 1)
                .reshape(q, ksub, mbytes, 1)
            )
            lut_spec = pl.BlockSpec(
                (1, ksub, mbytes, 1),
                lambda i, sids, qids: (qids[i], 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        kernel = functools.partial(_adc_kernel_t, seg=seg, m=m, ksub=ksub,
                                   packed=packed)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_slots,),
            in_specs=[
                pl.BlockSpec(
                    (1, mbytes, seg), lambda i, sids, qids: (sids[i], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                lut_spec,
            ],
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
                bytes_accessed=n_slots * (seg * mbytes + seg * 4)
                + q * m * ksub * 4,
                transcendentals=0,
            ),
            # Mosaic's default scoped-VMEM limit is 16M; embedded in the
            # full scan program at 207M shapes the instance wants 16.12M
            # (measured on chip) and the COMPILE fails. v5e has 128M of
            # VMEM — give the kernel real headroom.
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
            interpret=interpret,
        )(seg_ids.astype(jnp.int32), q_ids.astype(jnp.int32), codes3, luts_vm)
        return out.reshape(n_slots, seg)

    if packed:
        # lane-reorder per nibble half: luts_pk[q, ch, h, c*mc + jj] =
        # luts[q, 2*(ch*mc + jj) + h, c] — matches the packed kernel's
        # (repeat, iota // mc) lane encoding per half
        mb = mbytes
        mc = max(1, min(mb, 2048 // ksub))
        if mb % mc:
            raise ValueError(
                f"packed row-major ADC scan needs code bytes M/2={mb} "
                f"divisible by the lane chunk {mc} (i.e. M a multiple of "
                f"{2 * mc} for ksub={ksub}); use the transposed layout "
                f"or pick pq_m from {{{2 * mc}, {4 * mc}, ...}}")
        n_ch = mb // mc
        luts_vm = (
            luts.astype(jnp.float32)
            .reshape(q, n_ch, mc, 2, ksub)
            .transpose(0, 1, 3, 4, 2)
            .reshape(q, n_ch, 2, ksub * mc)
        )
        kernel = functools.partial(_adc_kernel_packed4, seg=seg, mb=mb,
                                   ksub=ksub)
        lut_spec = pl.BlockSpec(
            (1, n_ch, 2, ksub * mc), lambda i, sids, qids: (qids[i], 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        # pre-flatten LUTs value-major per m-chunk (in XLA, where reshapes
        # are free): luts_vm[q, ch, c*mc + ml] = luts[q, ch*mc + ml, c]
        mc = _mchunk(m, ksub)
        if m % mc:
            raise ValueError(
                f"row-major ADC scan needs M={m} divisible by the lane "
                f"chunk {mc} for ksub={ksub}; use the transposed layout "
                f"or a multiple-of-{mc} pq_m")
        n_ch = m // mc
        luts_vm = (
            luts.astype(jnp.float32)
            .reshape(q, n_ch, mc, ksub)
            .transpose(0, 1, 3, 2)
            .reshape(q, n_ch, ksub * mc)
        )
        kernel = functools.partial(_adc_kernel, seg=seg, m=m, ksub=ksub)
        lut_spec = pl.BlockSpec(
            (1, n_ch, ksub * mc), lambda i, sids, qids: (qids[i], 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_slots,),
        in_specs=[
            pl.BlockSpec(
                (1, seg, mbytes), lambda i, sids, qids: (sids[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            lut_spec,
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * seg * m * ksub,
            bytes_accessed=n_slots * (seg * m + seg * 4) + q * m * ksub * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seg_ids.astype(jnp.int32), q_ids.astype(jnp.int32), codes3, luts_vm)
    return out.reshape(n_slots, seg)


def adc_scan_xla(codes3, luts, seg_ids, q_ids, *, transposed=False):
    """XLA reference with identical semantics (gather-based)."""
    packed = _is_packed(codes3, luts, transposed)
    q, m, ksub = luts.shape
    codes = jnp.take(codes3, seg_ids, axis=0).astype(jnp.int32)
    if transposed:                                  # [S, MB, SEG] -> [S, SEG, MB]
        codes = codes.transpose(0, 2, 1)
    seg = codes.shape[1]
    if packed:
        # byte j -> (subspace 2j, subspace 2j+1)
        codes = jnp.stack([codes & 0xF, codes >> 4], axis=-1)
        codes = codes.reshape(codes.shape[0], seg, m)
    offs = (jnp.arange(m, dtype=jnp.int32) * ksub)[None, None, :]
    lut_flat = luts.reshape(q, m * ksub)
    lut_rows = jnp.take(lut_flat, q_ids, axis=0)                      # [S, M*ksub]
    vals = jnp.take_along_axis(
        lut_rows[:, None, :], codes + offs, axis=2
    )                                                                  # [S, SEG, M]
    return jnp.sum(vals, axis=-1)


def _adc_topk_kernel_t(seg_ids, q_ids, valid_cnt, codes_ref, lut_ref,
                       outv_ref, outi_ref, *, seg, m, ksub, kp, packed):
    """Fused transposed scan + per-slot top-k.

    The scores-matrix formulation writes [n_slots, SEG] f32 to HBM (36
    MB per 207M batch) and feeds it to lax.top_k — measured as the
    dominant cost of the hot path at scale (benchmarks/RESULTS.md 207M
    section). Here the running row stays in registers/VMEM and only
    [n_slots, kp] winners leave the kernel: validity masking in-kernel
    (valid_cnt scalar-prefetched), kp rounds of the max/argmax/mask
    idiom (ops/topk.py — Mosaic has no sort). The per-slot bias is NOT
    added here: it is constant within a slot, so top-k commutes with it
    and the caller adds it to the kp winners instead.
    """
    del seg_ids, q_ids
    i = pl.program_id(0)
    codes = codes_ref[0].astype(jnp.int32)          # [MB, SEG]
    mb = codes.shape[0]

    # deferred sublane reduction (see _adc_kernel_t): accumulate in
    # [MB, SEG], reduce 64->1 once after the value loop instead of per
    # code value
    if packed:
        lo = codes & 0xF
        hi = codes >> 4

        def body(c, acc):
            acc += jnp.where(lo == c, lut_ref[0, c, 0], 0.0)  # [MB, SEG]
            acc += jnp.where(hi == c, lut_ref[0, c, 1], 0.0)
            return acc
    else:
        def body(c, acc):
            return acc + jnp.where(codes == c, lut_ref[0, c], 0.0)

    acc = lax.fori_loop(0, ksub, body, jnp.zeros((mb, seg), jnp.float32))
    row = jnp.sum(acc, axis=0, keepdims=True)
    cols = lax.broadcasted_iota(jnp.int32, (1, seg), 1)
    row = jnp.where(cols < valid_cnt[i], row, -jnp.inf)

    # kp rounds of max/argmax/mask. Small kp: static unroll (fastest).
    # Large kp: fori_loop with select-writes into [1, kp] accumulators —
    # a kp>=64 static unroll overflows the Mosaic VMEM stack on chip
    # (ops/topk.py:96-127 records the same limit; CPU interpret mode
    # cannot catch it).
    if kp <= 16:
        sel_vals, sel_idx = [], []
        for _ in range(kp):
            mx = jnp.max(row, axis=1, keepdims=True)       # [1, 1]
            am = jnp.argmax(row, axis=1).reshape(1, 1)
            sel_vals.append(mx)
            sel_idx.append(am)
            row = jnp.where(cols == am, -jnp.inf, row)
        outv_ref[0, 0, :] = jnp.concatenate(sel_vals, axis=1)[0]
        outi_ref[0, 0, :] = jnp.concatenate(sel_idx, axis=1)[0]
    else:
        colk = lax.broadcasted_iota(jnp.int32, (1, kp), 1)

        def sel_body(j, carry):
            # winners carried as SCALARS: selecting a [1, 1] value into a
            # [1, kp] accumulator trips Mosaic's unimplemented sublane
            # broadcast on chip (caught by the real-TPU compile check)
            row, ov, oi = carry
            mx = jnp.max(row)
            am = jnp.argmax(row).astype(jnp.int32)
            ov = jnp.where(colk == j, mx, ov)
            oi = jnp.where(colk == j, am, oi)
            return jnp.where(cols == am, -jnp.inf, row), ov, oi

        _, ov, oi = lax.fori_loop(
            0, kp, sel_body,
            (row, jnp.full((1, kp), -jnp.inf, jnp.float32),
             jnp.zeros((1, kp), jnp.int32)),
        )
        outv_ref[0, 0, :] = ov[0]
        outi_ref[0, 0, :] = oi[0]


def adc_topk_pallas(codes3, luts, seg_ids, q_ids, valid_cnt, kp, *,
                    interpret=None, transposed=True):
    """Fused per-slot (scan -> mask -> top-kp): returns
    (vals [n_slots, kp] f32 raw ADC sums, rows [n_slots, kp] i32
    row-within-segment). Transposed payloads only (the production
    layout); the XLA twin `adc_topk_xla` covers both layouts and is the
    CPU oracle."""
    assert transposed, "fused scan+topk requires transposed payloads"
    n_segs, mbytes, seg = codes3.shape
    q, m, ksub = luts.shape
    packed = _is_packed(codes3, luts, transposed=True)
    assert mbytes == (m // 2 if packed else m)
    n_slots = seg_ids.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    lf = luts.astype(jnp.float32)
    if packed:
        luts_vm = (
            lf.reshape(q, mbytes, 2, ksub)
            .transpose(0, 3, 2, 1)
            .reshape(q, ksub, 2, mbytes, 1)
        )
        lut_spec = pl.BlockSpec(
            (1, ksub, 2, mbytes, 1),
            lambda i, sids, qids, vcnt: (qids[i], 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        luts_vm = lf.transpose(0, 2, 1).reshape(q, ksub, mbytes, 1)
        lut_spec = pl.BlockSpec(
            (1, ksub, mbytes, 1),
            lambda i, sids, qids, vcnt: (qids[i], 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(_adc_topk_kernel_t, seg=seg, m=m, ksub=ksub,
                               kp=kp, packed=packed)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_slots,),
        in_specs=[
            pl.BlockSpec(
                (1, mbytes, seg), lambda i, sids, qids, vcnt: (sids[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            lut_spec,
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, kp), lambda i, sids, qids, vcnt: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, kp), lambda i, sids, qids, vcnt: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    outv, outi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_slots, 1, kp), jnp.float32),
            jax.ShapeDtypeStruct((n_slots, 1, kp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * seg * m * ksub,
            bytes_accessed=n_slots * (seg * mbytes + 8 * kp)
            + q * m * ksub * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(seg_ids.astype(jnp.int32), q_ids.astype(jnp.int32),
      valid_cnt.astype(jnp.int32), codes3, luts_vm)
    return outv.reshape(n_slots, kp), outi.reshape(n_slots, kp)


def adc_topk_xla(codes3, luts, seg_ids, q_ids, valid_cnt, kp, *,
                 transposed=False):
    """XLA twin of adc_topk_pallas (both payload layouts; CPU oracle)."""
    scores = adc_scan_xla(codes3, luts, seg_ids, q_ids,
                          transposed=transposed)
    seg = scores.shape[1]
    cols = lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(cols < valid_cnt[:, None], scores, -jnp.inf)
    return lax.top_k(scores, kp)
