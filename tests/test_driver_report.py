"""Driver observability: target_all writes stage timings (SURVEY.md §5)."""

import gzip
import json
from pathlib import Path

from abstracts_search_tpu.config import Config
from abstracts_search_tpu.driver import Driver


def test_target_all_writes_build_report(tmp_path):
    # minimal one-partition snapshot
    pdir = tmp_path / "snap" / "updated_date=2024-01-01"
    pdir.mkdir(parents=True)
    lines = "\n".join(
        json.dumps({
            "id": f"W{i}", "title": f"T{i}", "language": "en",
            "abstract_inverted_index": {f"w{i}": [0], "x": [1]},
        })
        for i in range(40)
    )
    part = pdir / "part_000.gz"
    part.write_bytes(gzip.compress((lines + "\n").encode()))
    manifest = tmp_path / "manifest.json"
    manifest.write_text(json.dumps({"entries": [{"url": part.as_uri()}]}))

    cfg = Config(
        manifest_url=manifest.as_uri(), embed_dim=16, ivf_centroids=2,
        pq_m=4, pq_nbits=4, shard_size=64, row_group_size=16, embed_batch=8,
    )
    d = Driver(cfg, root=tmp_path, embedder="hash")
    d.target_all()

    report = json.loads((d.index_dir / "build_report.json").read_text())
    stages = [s["stage"] for s in report["stages"]]
    # tune_oracle: the exact-oracle pass runs (and is cached) BEFORE
    # fill installs the lists on device — HBM sequencing at 207M
    assert stages == ["build", "dump", "tune_oracle", "fill", "tune"]
    assert all(s["seconds"] >= 0 for s in report["stages"])
    assert report["total_seconds"] > 0
