"""Fused scored top-k scan.

The hot loop of exact flat search (BASELINE.md config 1) and the building
block of the IVF scan: given queries ``q [Q, D]`` and a corpus block
``x [N, D]``, produce the top-k inner products per query **without ever
materializing the [Q, N] score matrix in HBM** — at 207M rows that matrix
is the difference between bandwidth-bound and broken.

Two implementations:

- ``_topk_xla``: a `lax.scan` over corpus chunks carrying a running
  [Q, k] result. XLA keeps the per-chunk [Q, C] scores in registers/VMEM
  and fuses the mask; this is the CPU-mesh test path and a solid TPU
  fallback.
- ``_topk_pallas``: a Pallas kernel, grid over corpus chunks. Each step
  does the chunk matmul on the MXU and folds the chunk into a running
  top-k held in VMEM scratch (iterative max/argmax selection — Mosaic has
  no native sort). Output is written once, on the last grid step. The
  sequential grid makes the scratch carry safe, and the pipeline
  double-buffers chunk DMA behind the matmul automatically.

Two selection modes (measured on a v5e chip, 2M x 1024 bf16, k=10):

- ``mode="exact"``: bit-exact f32 selection. Each fold round costs a
  max + argmax + two masked reproductions over [Q, k+C] — ~490 GB/s of
  effective corpus bandwidth at k=10 (the fold, not the DMA, is the
  bottleneck; k=1 runs at 768 GB/s).
- ``mode="fast"``: scores are bit-packed into sortable int32 keys with
  the low ``log2(chunk)`` mantissa bits replaced by the lane id, so each
  round is ONE max + one mask — value and index in a single reduction.
  ~727 GB/s at k=10/chunk=4096 (1.5x exact). Cost: returned values keep
  only ``23 - log2(chunk)`` mantissa bits (rel err <= 2^-(23-lane_bits);
  at chunk=4096 that is 11 bits, rel err <= 2^-11 ~ 4.9e-4 — still below
  the bf16 input quantization already present) and near-ties may order
  differently. Both impls ("pallas" and "xla") implement IDENTICAL
  fast-mode semantics, so cross-impl tests stay exact.

The corpus length must be a multiple of ``chunk``; rows >= ``n_valid``
are padding and are masked to -inf (cf. SURVEY.md §7 "hard parts":
static shapes vs variable corpus sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _merge_topk(vals, idx, new_vals, new_idx, k):
    """Merge running [Q, k] with chunk [Q, C] candidates -> [Q, k]."""
    all_v = jnp.concatenate([vals, new_vals], axis=1)
    all_i = jnp.concatenate([idx, new_idx], axis=1)
    top_v, sel = lax.top_k(all_v, k)
    top_i = jnp.take_along_axis(all_i, sel, axis=1)
    return top_v, top_i


def _f32_precision(x):
    """f32 operands must request HIGHEST matmul precision: XLA:TPU's
    DEFAULT executes f32 dots as single-pass bf16 multiplies, which
    would silently reintroduce the bf16 quantization the caller chose
    f32 to escape (the plain-L2 ||c||^2/2 bias trick, the IVF-Flat
    exact scan). bf16 operands pass None — HIGHEST is meaningless for
    them and the spherical path keeps its bandwidth. Single-sourced
    HERE so every streaming_topk impl honors the invariant (round-5
    review findings; same precision class CLAUDE.md documents for
    XLA-CPU oneDNN)."""
    return lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def _topk_xla(q, x, n_valid, k, chunk):
    qf = q.astype(x.dtype)
    n_total, d = x.shape
    nchunks = n_total // chunk
    qn = q.shape[0]
    xs = x.reshape(nchunks, chunk, d)
    prec = _f32_precision(x)

    def body(carry, inp):
        i, xc = inp
        s = jnp.dot(qf, xc.T, preferred_element_type=jnp.float32,
                    precision=prec)
        cols = i * chunk + lax.broadcasted_iota(jnp.int32, (qn, chunk), 1)
        s = jnp.where(cols < n_valid, s, NEG_INF)
        return _merge_topk(carry[0], carry[1], s, cols, k), None

    init = (
        jnp.full((qn, k), NEG_INF, jnp.float32),
        jnp.zeros((qn, k), jnp.int32),
    )
    (vals, idx), _ = lax.scan(body, init, (jnp.arange(nchunks), xs))
    return vals, idx


def _topk_xla_fast(q, x, n_valid, k, chunk, lane_bits):
    """XLA twin of _topk_kernel_fast with IDENTICAL truncation and
    tie-break semantics (per-chunk packed-int top_k, then merge with
    first-occurrence preference), so cross-impl tests compare exactly."""
    qf = q.astype(x.dtype)
    n_total, d = x.shape
    nchunks = n_total // chunk
    qn = q.shape[0]
    xs = x.reshape(nchunks, chunk, d)
    prec = _f32_precision(x)

    def body(carry, inp):
        i, xc = inp
        s = jnp.dot(qf, xc.T, preferred_element_type=jnp.float32,
                    precision=prec)
        cols = lax.broadcasted_iota(jnp.int32, (qn, chunk), 1)
        s = jnp.where(i * chunk + cols < n_valid, s, FAST_SENTINEL)
        wk, _ = lax.top_k(_pack_keys(s, cols, lane_bits), k)
        wv, wl = _unpack_keys(wk, lane_bits)
        return _merge_topk(carry[0], carry[1], wv, i * chunk + wl, k), None

    init = (
        jnp.full((qn, k), NEG_INF, jnp.float32),
        jnp.zeros((qn, k), jnp.int32),
    )
    (vals, idx), _ = lax.scan(body, init, (jnp.arange(nchunks), xs))
    return vals, idx


# fast-mode sentinel for invalid rows: must be FINITE — clearing the low
# mantissa bits of -inf's bit pattern yields a NaN that poisons the
# selection. Anything <= FAST_INVALID in the output is mapped back to
# -inf by the wrapper.
FAST_SENTINEL = -3.0e38
FAST_INVALID = -1.0e38


def _fold_exact(vals_s, idx_s, new_v, new_i, k, qn):
    """Fold [Q, C] candidates into the running [Q, k] scratch: k rounds
    of max/argmax selection over the [Q, k + C] candidate set. Mosaic
    has no sort/gather and dynamic lane-indexed stores must be
    128-aligned, so winners are written via whole-array stores. Small k:
    static unroll (fastest). Large k: fori_loop with select-writes — a
    k=64+ unroll blows the Mosaic VMEM stack, and the loop overhead is
    amortized anyway."""
    mv = jnp.concatenate([vals_s[:], new_v], axis=1)
    mi = jnp.concatenate([idx_s[:], new_i], axis=1)
    colid = lax.broadcasted_iota(jnp.int32, mv.shape, 1)

    if k <= 16:
        sel_vals, sel_idx = [], []
        for _ in range(k):
            m = jnp.max(mv, axis=1, keepdims=True)
            am = jnp.argmax(mv, axis=1).reshape(qn, 1)
            sel = colid == am
            sel_vals.append(m)
            sel_idx.append(jnp.sum(jnp.where(sel, mi, 0), axis=1, keepdims=True))
            mv = jnp.where(sel, NEG_INF, mv)
        vals_s[:] = jnp.concatenate(sel_vals, axis=1)
        idx_s[:] = jnp.concatenate(sel_idx, axis=1)
    else:
        colk = lax.broadcasted_iota(jnp.int32, (qn, k), 1)

        def body(j, carry):
            mv, ov, oi = carry
            m = jnp.max(mv, axis=1, keepdims=True)
            am = jnp.argmax(mv, axis=1).reshape(qn, 1)
            sel = colid == am
            iv = jnp.sum(jnp.where(sel, mi, 0), axis=1, keepdims=True)
            ov = jnp.where(colk == j, m, ov)
            oi = jnp.where(colk == j, iv, oi)
            return jnp.where(sel, NEG_INF, mv), ov, oi

        _, ov, oi = lax.fori_loop(
            0, k, body,
            (mv, jnp.full((qn, k), NEG_INF, jnp.float32),
             jnp.zeros((qn, k), jnp.int32)),
        )
        vals_s[:] = ov
        idx_s[:] = oi


def _topk_kernel(nvalid_ref, q_ref, x_ref, outv_ref, outi_ref, vals_s,
                 idx_s, *, k, chunk, precision=None):
    # grid = (query tiles, corpus chunks); the chunk axis is minor, so for
    # one query tile all corpus chunks run sequentially and the VMEM
    # scratch legitimately carries the running top-k across them.
    i = pl.program_id(1)
    nchunks = pl.num_programs(1)
    qn = q_ref.shape[0]

    @pl.when(i == 0)
    def _():
        vals_s[:] = jnp.full_like(vals_s, NEG_INF)
        idx_s[:] = jnp.zeros_like(idx_s)

    # [QT, C] chunk scores on the MXU, f32 accumulation
    s = lax.dot_general(
        q_ref[:], x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    cols = i * chunk + lax.broadcasted_iota(jnp.int32, (qn, chunk), 1)
    s = jnp.where(cols < nvalid_ref[0], s, NEG_INF)

    _fold_exact(vals_s, idx_s, s, cols, k, qn)

    @pl.when(i == nchunks - 1)
    def _():
        outv_ref[:] = vals_s[:]
        outi_ref[:] = idx_s[:]


def _pack_keys(s, cols, lane_bits):
    """f32 scores -> sortable int32 keys with the low ``lane_bits``
    mantissa bits replaced by the lane id: ONE integer max then yields
    value AND index together. The sign-flip transform makes signed-int
    order match float order (involution, so decode reuses it)."""
    si = lax.bitcast_convert_type(s, jnp.int32)
    key = si ^ ((si >> 31) & 0x7FFFFFFF)
    return (key & ~((1 << lane_bits) - 1)) | cols


def _unpack_keys(wk, lane_bits):
    """packed keys -> (truncated f32 values, lane ids)."""
    mask_lo = (1 << lane_bits) - 1
    wl = wk & mask_lo
    kv = wk & ~mask_lo
    kv = kv ^ ((kv >> 31) & 0x7FFFFFFF)
    return lax.bitcast_convert_type(kv, jnp.float32), wl


def _topk_kernel_fast(nvalid_ref, q_ref, x_ref, outv_ref, outi_ref,
                      vals_s, idx_s, *, k, chunk, lane_bits,
                      precision=None):
    """Fast-mode kernel: packed-key selection (see module docstring).

    Per chunk: pack scores once, then k rounds of a single integer max +
    mask pick the chunk's top-k (value and lane id in one reduction —
    no argmax, no masked index reproduction), then an exact narrow merge
    folds the <=k decoded winners into the running [Q, k] scratch.
    Measured 727 GB/s vs 490 GB/s exact at k=10 (v5e, chunk=4096)."""
    i = pl.program_id(1)
    nchunks = pl.num_programs(1)
    qn = q_ref.shape[0]

    @pl.when(i == 0)
    def _():
        vals_s[:] = jnp.full_like(vals_s, NEG_INF)
        idx_s[:] = jnp.zeros_like(idx_s)

    s = lax.dot_general(
        q_ref[:], x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    cols = lax.broadcasted_iota(jnp.int32, (qn, chunk), 1)
    s = jnp.where(i * chunk + cols < nvalid_ref[0], s, FAST_SENTINEL)
    pk = _pack_keys(s, cols, lane_bits)

    if k <= 16:
        winners = []
        for _ in range(k):
            mx = jnp.max(pk, axis=1, keepdims=True)     # [qn, 1]
            winners.append(mx)
            pk = jnp.where(pk == mx, -(2**31), pk)
        wk = jnp.concatenate(winners, axis=1)           # [qn, k]
    else:
        colk = lax.broadcasted_iota(jnp.int32, (qn, k), 1)

        def body(j, carry):
            pk, wk = carry
            mx = jnp.max(pk, axis=1, keepdims=True)
            wk = jnp.where(colk == j, mx, wk)
            return jnp.where(pk == mx, -(2**31), pk), wk

        _, wk = lax.fori_loop(
            0, k, body, (pk, jnp.zeros((qn, k), jnp.int32)))

    wv, wl = _unpack_keys(wk, lane_bits)
    _fold_exact(vals_s, idx_s, wv, i * chunk + wl, k, qn)

    @pl.when(i == nchunks - 1)
    def _():
        outv_ref[:] = vals_s[:]
        outi_ref[:] = idx_s[:]


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _topk_pallas(q, x, n_valid, k, chunk, interpret, q_tile: int = 256,
                 fast: bool = False):
    qn, d = q.shape
    n_total = x.shape[0]
    nchunks = n_total // chunk
    q = q.astype(x.dtype)
    nvalid_arr = jnp.reshape(n_valid, (1,)).astype(jnp.int32)

    # tile the query axis too — a 20k-row assignment batch would not fit
    # a [Q, D] block in VMEM
    qt = min(q_tile, _round_up(qn, 8))
    q_pad = _round_up(qn, qt)
    if q_pad != qn:
        q = jnp.pad(q, ((0, q_pad - qn), (0, 0)))

    prec = _f32_precision(x)
    if fast:
        kernel = functools.partial(_topk_kernel_fast, k=k, chunk=chunk,
                                   lane_bits=max(1, chunk.bit_length() - 1),
                                   precision=prec)
    else:
        kernel = functools.partial(_topk_kernel, k=k, chunk=chunk,
                                   precision=prec)
    outv, outi = pl.pallas_call(
        kernel,
        grid=(q_pad // qt, nchunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((qt, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qt, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qt, k), jnp.float32),
            pltpu.VMEM((qt, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_total * d,
            bytes_accessed=n_total * d * x.dtype.itemsize * (q_pad // qt),
            transcendentals=0,
        ),
        # chunk=4096 blocks need ~16.4M of scoped VMEM — past Mosaic's
        # 16M default; v5e has 128M (cf. ops/adc.py)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(nvalid_arr, q, x)
    if q_pad != qn:
        outv, outi = outv[:qn], outi[:qn]
    return outv, outi


def streaming_topk(q, x, n_valid, k: int, *, chunk: int = 1024,
                   impl: str = "auto", mode: str = "exact"):
    """Top-k inner products of q against x[:n_valid].

    q: [Q, D]; x: [N, D] with N a multiple of ``chunk``; n_valid: traced
    scalar count of real rows. Returns (values [Q, k] f32, row indices
    [Q, k] i32). impl: "pallas" | "xla" | "auto" (pallas on TPU).
    Dtype contract: the matmul runs in ``x.dtype`` — callers pick bf16
    for bandwidth (spherical/unit-norm scores) or f32 for exactness;
    f32 operands automatically request HIGHEST matmul precision so
    XLA:TPU cannot downgrade them to bf16 passes (see _f32_precision).
    mode: "exact" (bit-exact selection) | "fast" (packed-key selection,
    ~1.5x faster at k~10; values keep 23 - log2(chunk) mantissa bits
    (rel err <= 2^-11 at chunk=4096) and near-ties may reorder — see
    module docstring). Both impls implement identical fast-mode
    semantics.
    """
    if x.shape[0] % chunk != 0:
        raise ValueError(f"corpus rows {x.shape[0]} not a multiple of chunk {chunk}")
    if k > chunk:
        raise ValueError(f"k={k} must be <= chunk={chunk}")
    if mode not in ("exact", "fast"):
        raise ValueError(f"unknown mode {mode!r}")
    fast = mode == "fast"
    if fast and chunk & (chunk - 1):
        raise ValueError(f"fast mode needs a power-of-two chunk, got {chunk}")
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        if fast:
            vals, idx = _topk_xla_fast(q, x, n_valid, k, chunk,
                                       max(1, chunk.bit_length() - 1))
        else:
            return _topk_xla(q, x, n_valid, k, chunk)
    elif impl == "pallas":
        vals, idx = _topk_pallas(q, x, n_valid, k, chunk, fast=fast,
                                 interpret=jax.default_backend() != "tpu")
    elif impl == "pallas_interpret":
        vals, idx = _topk_pallas(q, x, n_valid, k, chunk, fast=fast,
                                 interpret=True)
    else:
        raise ValueError(f"unknown impl {impl!r}")
    if fast:
        # invalid rows were masked with the finite sentinel in-kernel
        # (truncating -inf yields NaN); restore the -inf contract
        vals = jnp.where(vals <= FAST_INVALID, NEG_INF, vals)
    return vals, idx
