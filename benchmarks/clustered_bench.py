"""Clustered-corpus benchmark: recall + QPS where IVF actually bites.

VERDICT.md round-1 weak #2 / next-round #8: isotropic random vectors
can't measure IVF quality — real embeddings live near a low-dimensional
manifold with zipfian cluster masses, which is exactly the regime where
coarse probing works (recall curves mean something) and where list-size
skew used to destroy the padded scan (next-round #1). This benchmark:

  1. generates a mixture-of-Gaussians corpus on a d'<<D subspace with
     zipf-distributed cluster masses (list sizes end up heavily skewed),
  2. builds OPQ+IVF-PQ on the real chip, reports the list-size skew,
  3. sweeps nprobe against a streamed exact oracle (global positions),
  4. repeats on a BALANCED corpus (uniform masses) and compares QPS at
     equal recall — the work-proportional-scan acceptance test
     ("QPS within ~1.5x of the balanced case at equal recall").

Run: python benchmarks/clustered_bench.py [--n 2097152] [--lists 4096]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

D = 1024
NQ = 256
K = 10


def clustered_corpus(n, d, *, d_intrinsic=64, n_clusters=4096, zipf_a=1.1,
                     noise=0.5, balanced=False, seed=0, chunk=1 << 17):
    """Unit-norm corpus near a d_intrinsic-dim subspace; cluster masses
    zipfian (balanced=False) or uniform. Returns (x, labels)."""
    rng = np.random.default_rng(seed)
    basis, _ = np.linalg.qr(rng.standard_normal((d, d_intrinsic)).astype(np.float32))
    centers = rng.standard_normal((n_clusters, d_intrinsic)).astype(np.float32)
    if balanced:
        p = np.full(n_clusters, 1.0 / n_clusters)
    else:
        p = 1.0 / np.arange(1, n_clusters + 1) ** zipf_a
        p /= p.sum()
    labels = rng.choice(n_clusters, size=n, p=p).astype(np.int32)

    x = np.empty((n, d), np.float32)
    for lo in range(0, n, chunk):
        lab = labels[lo : lo + chunk]
        low = centers[lab] + noise * rng.standard_normal(
            (len(lab), centers.shape[1])).astype(np.float32)
        x[lo : lo + chunk] = low @ basis.T
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return x, labels


def exact_oracle(x, q, k, chunk_rows=1 << 18):
    """Streamed exact top-k (global positions), device matmuls."""
    import jax
    import jax.numpy as jnp

    from abstracts_search_tpu.ops.topk import streaming_topk

    qd = jnp.asarray(q, jnp.bfloat16)
    fn = jax.jit(lambda qq, xx, nv: streaming_topk(qq, xx, nv, k, chunk=2048))
    best_v = np.full((len(q), k), -np.inf, np.float32)
    best_p = np.full((len(q), k), -1, np.int64)
    for lo in range(0, len(x), chunk_rows):
        xc = x[lo : lo + chunk_rows]
        n = len(xc)
        pad = -(-n // 2048) * 2048
        if pad != n:
            xc = np.concatenate([xc, np.zeros((pad - n, x.shape[1]), np.float32)])
        v, i = fn(qd, jnp.asarray(xc, jnp.bfloat16), jnp.int32(n))
        v = np.asarray(v, np.float32)
        p = np.asarray(i, np.int64) + lo
        p[v == -np.inf] = -1
        av = np.concatenate([best_v, v], axis=1)
        ap = np.concatenate([best_p, p], axis=1)
        sel = np.argsort(-av, axis=1)[:, :k]
        best_v = np.take_along_axis(av, sel, axis=1)
        best_p = np.take_along_axis(ap, sel, axis=1)
    return best_v, best_p


def measure_rtt(reps=20):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    a = f(jnp.zeros(8))
    np.asarray(a)
    t0 = time.time()
    for _ in range(reps):
        np.asarray(f(a))
    return (time.time() - t0) / reps


def build_and_sweep(tag, x, idx_kw, nprobes, rtt):
    from abstracts_search_tpu.index.ivfpq import IVFPQIndex
    from abstracts_search_tpu.parallel import build_mesh

    rng = np.random.default_rng(1)
    n = len(x)
    q = x[rng.choice(n, NQ, replace=False)] + 0.05 * rng.standard_normal(
        (NQ, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    t0 = time.time()
    _, ref = exact_oracle(x, q, K)
    print(f"[{tag}] exact oracle: {time.time()-t0:.0f}s", flush=True)

    idx = IVFPQIndex(mesh=build_mesh(), **idx_kw)
    t0 = time.time()
    idx.train(x[:200_000], kmeans_iters=6, opq_iters=2, pq_iters=6)
    print(f"[{tag}] train: {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    chunk_rows = 1 << 18
    idx.fill_stream(
        (x[lo:lo + chunk_rows], np.arange(lo, min(lo + chunk_rows, n), dtype=np.int64))
        for lo in range(0, n, chunk_rows)
    )
    t_fill = time.time() - t0
    cnt = idx.packed.seg_cnt
    print(f"[{tag}] fill: {t_fill:.0f}s ({n/t_fill/1e3:.0f} kvec/s); "
          f"list segs max={cnt.max()} mean={cnt.mean():.2f} "
          f"p99={np.percentile(cnt, 99):.0f} (skew={cnt.max()/max(cnt.mean(),1e-9):.0f}x)",
          flush=True)

    rows = []
    print(f"[{tag}] {'nprobe':>7} {'recall@10':>10} {'ms/batch':>9} {'QPS/chip':>9} "
          f"{'live_slots':>10} {'bucket':>7}")
    for nprobe in nprobes:
        v, pos = idx.search(q, K, nprobe=nprobe)
        recall = np.mean([len(set(pos[i]) & set(ref[i])) / K for i in range(NQ)])
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            idx.search(q, K, nprobe=nprobe)
        # two device round trips per two-phase search via the HTTP tunnel
        dt = max((time.time() - t0) / reps - 2 * rtt, 1e-9)
        st = idx.last_scan_stats
        print(f"[{tag}] {nprobe:>7} {recall:>10.3f} {dt*1e3:>9.1f} {NQ/dt:>9.0f} "
              f"{st['live_slots']:>10} {st['bucket']:>7}", flush=True)
        rows.append({"nprobe": nprobe, "recall": recall, "qps": NQ / dt,
                     "live_slots": st["live_slots"], "bucket": st["bucket"]})
    return rows


def main():
    from abstracts_search_tpu.utils.watchdog import Watchdog

    _wd = Watchdog.for_benchmark('clustered_bench')  # wedge guard (VERDICT r3 #8)
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_097_152)
    ap.add_argument("--lists", type=int, default=4096)
    ap.add_argument("--seg", type=int, default=512)
    args = ap.parse_args()

    import jax
    print("backend:", jax.default_backend(), flush=True)
    rtt = measure_rtt()
    print(f"tunnel RTT ~{rtt*1e3:.1f} ms (subtracted 2x per search)", flush=True)

    idx_kw = dict(n_lists=args.lists, dim=D, pq_m=64, pq_nbits=8, use_opq=True,
                  seg_size=args.seg, chunk=2048, seed=0, scan_impl="slots")
    nprobes = (4, 8, 16, 32, 64)

    t0 = time.time()
    xz, _ = clustered_corpus(args.n, D, balanced=False, seed=0)
    print(f"zipfian corpus gen: {time.time()-t0:.0f}s", flush=True)
    zipf = build_and_sweep("zipf", xz, idx_kw, nprobes, rtt)
    del xz

    t0 = time.time()
    xb, _ = clustered_corpus(args.n, D, balanced=True, seed=0)
    print(f"balanced corpus gen: {time.time()-t0:.0f}s", flush=True)
    bal = build_and_sweep("balanced", xb, idx_kw, nprobes, rtt)
    del xb

    # Acceptance (VERDICT round-1 next #1): at equal nprobe the zipfian
    # corpus may only pay for the rows it actually probes — the padded
    # round-1 layout paid for the LONGEST list at every probe. Report
    # the QPS ratio alongside the honest work ratio (live slots).
    for rz, rb in zip(zipf, bal):
        qps_ratio = rb["qps"] / max(rz["qps"], 1e-9)
        work_ratio = rz["live_slots"] / max(rb["live_slots"], 1)
        print(f"nprobe={rz['nprobe']:>3}: zipf {rz['qps']:>6.0f} QPS "
              f"(recall {rz['recall']:.3f}) vs balanced {rb['qps']:>6.0f} QPS "
              f"(recall {rb['recall']:.3f}) -> balanced/zipf time {qps_ratio:.2f}x, "
              f"zipf/balanced probed rows {work_ratio:.2f}x", flush=True)


if __name__ == "__main__":
    main()
