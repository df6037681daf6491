"""Steady-state serve sweep on the existing 207M production artifacts.

Loads the filled index fresh (no rebuild, no retune) and measures, at
each nprobe, true end-to-end batch QPS + recall vs the cached exact
oracle, with the fused single-dispatch vs 2-dispatch A/B. Run on a
QUIET host — the driver-level numbers in prod_report.json/params.json
can be depressed by concurrent CPU load during long builds.

    python benchmarks/prod_serve_sweep.py --root /tmp/astpu_prod207m
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

    _wd = Watchdog.for_benchmark("prod_serve_sweep")
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/astpu_prod207m")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--nprobes", type=int, nargs="*", default=[1, 2, 4, 8])
    args = ap.parse_args()

    from abstracts_search_tpu.index.ivfpq import IVFPQIndex
    from abstracts_search_tpu.index.tune import read_params
    from abstracts_search_tpu.parallel import build_mesh

    root = Path(args.root)
    params = read_params(root / "index" / "params.json")
    z = np.load(root / "index" / "tune_oracle.npz", allow_pickle=False)
    queries = np.asarray(z["queries"], np.float32)[: args.batch]
    ref = np.asarray(z["ref"], np.int64)[: args.batch]

    t0 = time.time()
    idx = IVFPQIndex.load(root / "index" / "index", mesh=build_mesh(),
                          storage="auto")
    print(f"[sweep] index loaded (n={idx.n:,}, storage resolves at "
          f"install): {time.time() - t0:.0f} s", flush=True)

    table = []
    for np_ in args.nprobes:
        row = {"nprobe": np_}
        for label, fuse in (("fused", True), ("two_dispatch", False)):
            idx.fuse_dispatch = fuse
            idx.search(queries, 10, nprobe=np_)       # warm/compile
            v, p = idx.search(queries, 10, nprobe=np_)
            t0 = time.time()
            for _ in range(args.reps):
                v, p = idx.search(queries, 10, nprobe=np_)
            dt = (time.time() - t0) / args.reps
            row[f"qps_{label}"] = round(args.batch / dt, 1)
            row[f"ms_{label}"] = round(dt * 1e3, 2)
            if fuse:
                row["stats"] = dict(idx.last_scan_stats)
                row["recall_at_10"] = round(float(np.mean(
                    [len(set(p[i]) & set(ref[i])) / 10
                     for i in range(len(ref))])), 4)
        idx.fuse_dispatch = True
        row["fusion_speedup"] = round(
            row["qps_fused"] / max(row["qps_two_dispatch"], 1e-9), 3)
        table.append(row)
        print(f"[sweep] nprobe={np_}: recall {row['recall_at_10']:.4f} "
              f"fused {row['qps_fused']:.0f} QPS ({row['ms_fused']:.0f} ms) "
              f"vs 2-dispatch {row['qps_two_dispatch']:.0f} QPS "
              f"({row['fusion_speedup']:.2f}x)  stats={row['stats']}",
              flush=True)

    out = {"tuned_nprobe": params["nprobe"], "batch": args.batch,
           "storage": idx.storage, "sweep": table}
    (root / "serve_sweep_report.json").write_text(json.dumps(out, indent=2))
    print("[sweep] RESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
