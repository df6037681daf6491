"""Retune the 207M production artifact at the device-resident geometry.

Run AFTER `seg256_device_bench.py` validated the seg-256 repack: this
dogfoods the operational path end-to-end on the REAL driver artifacts —
`astpu index resegment` on the production tree, then a forced re-tune
(cached oracle: the sweep re-measures QPS at each nprobe on the now
fully device-resident index) and a steady serve-path measurement at the
chosen operating point.

    python benchmarks/prod_retune_seg256.py --root /tmp/astpu_prod207m
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

    _wd = Watchdog.for_benchmark('prod_retune_seg256')  # wedge guard (VERDICT r3 #8)
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/astpu_prod207m")
    ap.add_argument("--seg", type=int, default=256)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    root = Path(args.root)
    from abstracts_search_tpu.cli import main as cli_main
    from abstracts_search_tpu.config import Config
    from abstracts_search_tpu.driver import Driver
    from abstracts_search_tpu.index.tune import read_params

    cfg = Config(
        data_dir=str(root / "data"),
        index_dir=str(root / "index"),
        store_path=str(root / "data.sqlite"),
        events_dir=str(root / "events"),
        ivf_centroids=65_536, train_sample=10_000_000,
        pq_m=128, pq_nbits=4, index_storage="auto",
    )

    # 1. resegment in place through the CLI (idempotent)
    t0 = time.time()
    rc = cli_main(["index", "-B", str(root / "index"), "resegment",
                   "--seg-size", str(args.seg)])
    assert rc in (0, None), rc
    print(f"[retune] resegment: {time.time() - t0:.0f} s", flush=True)

    # 2. forced re-tune (cached oracle; sweep measures QPS per nprobe
    # on the device-resident index through the real driver)
    drv = Driver(cfg)
    t0 = time.time()
    drv.target_tune(force=True)
    t_tune = time.time() - t0
    params = read_params(drv.params_path)
    print(f"[retune] tune: {t_tune:.0f} s -> nprobe={params['nprobe']} "
          f"recall={params['achieved_recall']:.4f}", flush=True)
    print(f"[retune] operating points: {params['operating_points']}", flush=True)

    # 3. steady serve sweep (nprobe 1/2/4 + the tuned point) with the
    # fused single-dispatch vs 2-dispatch A/B at each point — the
    # round-3 queued chip evidence, captured in one run
    from abstracts_search_tpu.index.tune import load_oracle_cache  # noqa: F401
    z = np.load(root / "index" / "tune_oracle.npz", allow_pickle=False)
    queries = np.asarray(z["queries"], np.float32)[: args.batch]
    ref = np.asarray(z["ref"], np.int64)[: args.batch]
    idx = drv._load_index(filled=True)
    nprobe = int(params["nprobe"])
    sweep = sorted({1, 2, 4, nprobe})
    table = []
    for np_ in sweep:
        row = {"nprobe": np_}
        for label, fuse in (("fused", True), ("two_dispatch", False)):
            idx.fuse_dispatch = fuse
            idx.search(queries, 10, nprobe=np_)     # warm/compile
            v, p = idx.search(queries, 10, nprobe=np_)
            t0 = time.time()
            for _ in range(args.reps):
                v, p = idx.search(queries, 10, nprobe=np_)
            dt = (time.time() - t0) / args.reps
            row[f"qps_{label}"] = round(args.batch / dt, 1)
            row[f"ms_{label}"] = round(dt * 1e3, 2)
            if fuse:
                row["fused_stats"] = dict(idx.last_scan_stats)
                row["recall_at_10"] = round(float(np.mean(
                    [len(set(p[i]) & set(ref[i])) / 10
                     for i in range(len(ref))])), 4)
        idx.fuse_dispatch = True
        row["fusion_speedup"] = round(
            row["qps_fused"] / max(row["qps_two_dispatch"], 1e-9), 3)
        table.append(row)
        print(f"[retune] nprobe={np_}: recall {row['recall_at_10']:.4f} "
              f"fused {row['qps_fused']:.0f} QPS vs 2-dispatch "
              f"{row['qps_two_dispatch']:.0f} QPS "
              f"({row['fusion_speedup']:.2f}x)", flush=True)
    out = {"nprobe": nprobe,
           "tune_s": round(t_tune, 1),
           "batch": args.batch,
           "sweep": table,
           "operating_points": params["operating_points"]}
    (root / "retune_seg256_report.json").write_text(json.dumps(out, indent=2))
    print("[retune] RESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
