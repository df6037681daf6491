"""End-to-end quarterly sync benchmark — BASELINE.md config 5.

Runs the ENTIRE pipeline exactly as the driver orchestrates it
(manifest fetch -> download | gunzip | native filter | embed | store ->
dump -> train -> fill -> tune -> query), on a synthetic OpenAlex
snapshot, then simulates the next quarter (new partition appears) and
re-syncs incrementally. The hash embedder stands in for stella so the
run times the *pipeline*; encoder throughput is measured separately
(embed_bench.py).

Produces stage timings (the driver writes build_report.json) and prints
a summary.
"""

import gzip
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_WORKS = 100_000
N_PARTS = 4


def _mk_snapshot(root: Path, dates_counts) -> str:
    rng = np.random.default_rng(0)
    entries = []
    vocab = [f"term{i}" for i in range(5000)]
    for date, count in dates_counts:
        per = count // N_PARTS
        for p in range(N_PARTS):
            pdir = root / "snap" / f"updated_date={date}"
            pdir.mkdir(parents=True, exist_ok=True)
            lines = []
            for i in range(per):
                wid = f"https://openalex.org/W{date.replace('-','')}{p:02d}{i:06d}"
                words = rng.choice(vocab, size=12)
                inv = {w: [int(j)] for j, w in enumerate(words)}
                lines.append(json.dumps({
                    "id": wid, "title": f"Paper {i}", "language": "en",
                    "abstract_inverted_index": inv,
                    "cited_by_count": int(rng.integers(0, 500)),
                }))
            f = pdir / f"part_{p:03d}.gz"
            f.write_bytes(gzip.compress(("\n".join(lines) + "\n").encode()))
            entries.append({"url": f.as_uri()})
    mf = root / "manifest.json"
    mf.write_text(json.dumps({"entries": entries}))
    return mf.as_uri()


def main() -> None:
    from abstracts_search_tpu.utils.watchdog import Watchdog

    _wd = Watchdog.for_benchmark('e2e_sync_bench')  # wedge guard (VERDICT r3 #8)
    from abstracts_search_tpu.config import Config
    from abstracts_search_tpu.driver import Driver, read_ids_parquet
    from abstracts_search_tpu.serve.engine import SearchEngine

    tmp = Path(tempfile.mkdtemp(prefix="e2e_sync_"))
    try:
        url = _mk_snapshot(tmp, [("2026-01-01", N_WORKS)])
        cfg = Config(
            manifest_url=url, embed_dim=256, ivf_centroids=512,
            pq_m=32, pq_nbits=8, train_sample=50_000,
            shard_size=65_536, row_group_size=16_384, embed_batch=256,
        )
        d = Driver(cfg, root=tmp, embedder="hash")

        t0 = time.time()
        d.target_all()
        t_all = time.time() - t0
        report = json.loads((d.index_dir / "build_report.json").read_text())
        n_ids = len(read_ids_parquet(d.ids_path))
        params = json.loads(d.params_path.read_text())
        print(f"initial sync: {t_all:.0f}s total, {n_ids} works indexed")
        for s in report["stages"]:
            print(f"  {s['stage']}: {s['seconds']:.1f}s")
        print(f"  tuned nprobe={params['nprobe']} recall={params['achieved_recall']:.3f}")

        # quarterly delta: +25% new works, rerun the same command
        url2 = _mk_snapshot(tmp, [("2026-01-01", N_WORKS), ("2026-04-01", N_WORKS // 4)])
        d.cfg = d.cfg.replace(manifest_url=url2)
        t0 = time.time()
        d.target_all()
        t_sync = time.time() - t0
        n2 = len(read_ids_parquet(d.ids_path))
        print(f"quarterly re-sync (+{N_WORKS // 4} works): {t_sync:.0f}s, "
              f"{n2} works indexed (train skipped: frozen quantizer)")

        # serve a query end to end
        engine = SearchEngine.from_artifacts(cfg, index_dir=d.index_dir,
                                             embedder="hash", hydrate=False)
        t0 = time.time()
        res = engine.search("Paper 17 term3 term100", k=5)
        print(f"query path: {1e3*(time.time()-t0):.0f} ms (incl. compile), "
              f"top hit {res[0]['id'] if res else 'NONE'}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
