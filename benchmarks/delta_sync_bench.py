"""Incremental vs full sync cost, and the serve-time delta overhead.

The reference's quarterly sync re-fills the whole index
(/root/reference/Makefile:23-25); `astpu sync --incremental` fills only
rows past the store's revision watermark into a delta sub-index
(driver._fill_delta; DESIGN.md §6b). This runner measures, at a chosen
base size:

  1. full fill wall-clock (the reference-parity sync cost),
  2. incremental fill wall-clock for a delta of --delta-rows
     new/updated works (the O(delta) replacement),
  3. merged-serve QPS with 0 and 1 delta sub-index (the per-batch cost
     of the extra sub-index search round trip).

Runs on the CPU mesh for semantics or on the chip for real numbers:

    python benchmarks/delta_sync_bench.py --n 500000 --delta-rows 5000
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    from abstracts_search_tpu.utils.watchdog import Watchdog

    _wd = Watchdog.for_benchmark('delta_sync_bench')  # wedge guard (VERDICT r3 #8)
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--delta-rows", type=int, default=5_000)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--lists", type=int, default=1024)
    ap.add_argument("--pq-m", type=int, default=128)
    ap.add_argument("--pq-nbits", type=int, default=4)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--root", default="/tmp/astpu_delta_bench")
    args = ap.parse_args()

    from abstracts_search_tpu.config import Config
    from abstracts_search_tpu.driver import Driver
    from abstracts_search_tpu.serve.engine import SearchEngine
    from abstracts_search_tpu.storage.sqlite_store import EmbeddingStore, init_store

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    cfg = Config(
        data_dir=str(root / "emb" / "data"),
        index_dir=str(root / "index"),
        store_path=str(root / "data.sqlite"),
        events_dir=str(root / "events"),
        ivf_centroids=args.lists,
        train_sample=min(args.n, 200_000),
        pq_m=args.pq_m, pq_nbits=args.pq_nbits,
        embed_dim=args.dim, model_name="hash-test",
    )
    (root / "events").mkdir(exist_ok=True)

    rng = np.random.default_rng(0)

    def vecs(n, seed):
        r = np.random.default_rng(seed)
        x = r.standard_normal((n, args.dim)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    if not Path(cfg.store_path).exists():
        store = init_store(cfg.store_path)
        store.bump_rev()
        for lo in range(0, args.n, 65_536):
            hi = min(lo + 65_536, args.n)
            store.upsert([f"W{i:09d}" for i in range(lo, hi)], vecs(hi - lo, lo))
        store.close()

    drv = Driver(cfg)
    drv.target_dump()
    t0 = time.time()
    drv.target_fill(force=True)
    t_full = time.time() - t0
    print(f"[delta] full fill ({args.n:,} rows): {t_full:.1f} s", flush=True)

    # quarterly delta: half new works, half updates of existing ones
    store = EmbeddingStore(cfg.store_path)
    store.bump_rev()
    nd = args.delta_rows
    store.upsert([f"N{i:09d}" for i in range(nd // 2)], vecs(nd // 2, 10**6))
    store.upsert([f"W{i:09d}" for i in range(nd - nd // 2)],
                 vecs(nd - nd // 2, 2 * 10**6))
    store.close()
    drv.target_dump(force=True)
    t0 = time.time()
    assert drv.target_fill(incremental=True)
    t_inc = time.time() - t0
    print(f"[delta] incremental fill ({nd:,} rows): {t_inc:.1f} s "
          f"({t_full / max(t_inc, 1e-9):.0f}x faster than full)", flush=True)

    q = vecs(args.batch, 42)
    out = {"n": args.n, "delta_rows": nd,
           "full_fill_s": round(t_full, 1), "inc_fill_s": round(t_inc, 1)}
    for label, deltas in (("base_only", False), ("base_plus_delta", True)):
        eng = SearchEngine.from_artifacts(
            cfg, index_dir=cfg.index_dir, embedder="hash", hydrate=False,
            warmup=False)
        if not deltas:
            eng.deltas = []  # property setter rebuilds newest-wins masks
        # warm + steady
        eng._search_ids(q, 10)
        eng._search_ids(q, 10)
        t0 = time.time()
        for _ in range(args.reps):
            eng._search_ids(q, 10)
        dt = (time.time() - t0) / args.reps
        out[label + "_qps"] = round(args.batch / dt, 1)
        print(f"[delta] serve {label}: {args.batch / dt:.0f} QPS "
              f"({dt * 1e3:.1f} ms/batch)", flush=True)

    (root / "delta_report.json").write_text(json.dumps(out, indent=2))
    print("[delta] RESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
