"""Full-shard validation: BASELINE.md configs 2/4 at one-shard scale.

Builds an IVF-PQ index over one reference-sized shard (2,097,152 x 1024)
on the real chip, sweeps nprobe against the exact flat oracle, and
prints an operating-point table (recall@10 vs QPS/chip).
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = 2_097_152
D = 1024
K_LISTS = 4096
TRAIN = 200_000
NQ = 256


def main() -> None:
    from abstracts_search_tpu.utils.watchdog import Watchdog

    _wd = Watchdog.for_benchmark('shard2m_bench')  # wedge guard (VERDICT r3 #8)
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_097_152)
    ap.add_argument("--seg", type=int, default=512)
    ap.add_argument("--pq-m", type=int, default=64)
    ap.add_argument("--pq-nbits", type=int, default=8)
    args = ap.parse_args()
    n_rows = args.n
    import jax
    import jax.numpy as jnp

    from abstracts_search_tpu.index import FlatIndex
    from abstracts_search_tpu.index.ivfpq import IVFPQIndex
    from abstracts_search_tpu.parallel import build_mesh

    rng = np.random.default_rng(0)
    t0 = time.time()
    x = rng.standard_normal((n_rows, D), dtype=np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    print(f"corpus gen: {time.time()-t0:.0f}s", flush=True)

    # query = corpus row + small perturbation. At D=1024 a per-dim noise
    # of 0.1 gives a noise VECTOR of norm ~3.2 vs the unit row — the
    # query becomes 95% noise and coarse probing degenerates (that's the
    # data model being broken, not the index). 0.01/dim => cosine ~0.95
    # to the source, which is what real near-duplicate queries look like.
    q = x[rng.choice(n_rows, NQ, replace=False)] + 0.01 * rng.standard_normal((NQ, D), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    mesh = build_mesh()

    t0 = time.time()
    flat = FlatIndex(mesh, chunk=2048)
    flat.add(x)
    _, ref = flat.search(q, 10)
    print(f"exact oracle: {time.time()-t0:.0f}s", flush=True)
    del flat

    idx = IVFPQIndex(K_LISTS, D, pq_m=args.pq_m, pq_nbits=args.pq_nbits,
                     use_opq=False, mesh=mesh, seg_size=args.seg, chunk=2048,
                     seed=0, scan_impl="slots")
    t0 = time.time()
    idx.train(x[:TRAIN], kmeans_iters=6, pq_iters=6)
    t_train = time.time() - t0
    print(f"train: {t_train:.0f}s", flush=True)

    t0 = time.time()
    chunk_rows = 1 << 18
    idx.fill_stream(
        (x[lo:lo + chunk_rows], np.arange(lo, min(lo + chunk_rows, n_rows), dtype=np.int64))
        for lo in range(0, n_rows, chunk_rows)
    )
    t_fill = time.time() - t0
    print(f"fill: {t_fill:.0f}s ({n_rows/t_fill/1e3:.0f} kvec/s) "
          f"payload {idx.packed.data.nbytes/2**20:.0f} MiB", flush=True)

    # measure tunnel RTT; the two-phase search syncs twice per call
    tiny = jax.jit(lambda v: v + 1)
    z = jnp.zeros((8,))
    np.asarray(tiny(z))
    t0 = time.time()
    for _ in range(10):
        np.asarray(tiny(z))
    rtt = (time.time() - t0) / 10

    print(f"{'nprobe':>7} {'recall@10':>10} {'1-recall@10':>12} {'ms/batch':>9} {'QPS/chip':>9}")
    for nprobe in (8, 16, 32, 64, 128):
        v, pos = idx.search(q, 10, nprobe=nprobe)
        overlap = np.mean([len(set(pos[i]) & set(ref[i])) / 10 for i in range(NQ)])
        hit1 = np.mean([ref[i, 0] in pos[i] for i in range(NQ)])
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            idx.search(q, 10, nprobe=nprobe)
        dt = (time.time() - t0) / reps - 2 * rtt
        print(f"{nprobe:>7} {overlap:>10.3f} {hit1:>12.3f} {dt*1e3:>9.1f} {NQ/dt:>9.0f}", flush=True)


if __name__ == "__main__":
    main()
