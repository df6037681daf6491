"""Autotune: operating points, target selection, params.json round trip."""

import numpy as np

from abstracts_search_tpu.index.ivf import IVFFlatIndex
from abstracts_search_tpu.index.tune import (
    make_holdout_queries,
    read_params,
    tune_index,
    write_params,
)
from abstracts_search_tpu.parallel import build_mesh


def test_tune_selects_cheapest_point_meeting_target(tmp_path, rng):
    n, d = 1500, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = IVFFlatIndex(16, mesh=build_mesh(), seg_size=32, chunk=128, seed=0)
    idx.train(x, iters=6)
    idx.fill(x)

    params = tune_index(idx, x, n_queries=32, k=5, target_recall=0.9,
                        nprobes=(1, 2, 4, 8, 16), timing_reps=1)
    pts = params["operating_points"]
    assert [p["nprobe"] for p in pts] == [1, 2, 4, 8, 16]
    # exact-probe end of the sweep is perfect recall (IVF-Flat, queries
    # are corpus rows)
    assert pts[-1]["recall"] > 0.999
    # monotone nondecreasing recall within noise
    for a, b in zip(pts, pts[1:]):
        assert b["recall"] >= a["recall"] - 0.05
    # chosen point = first meeting the target
    first = next(p for p in pts if p["recall"] >= 0.9)
    assert params["nprobe"] == first["nprobe"]
    assert params["achieved_recall"] == first["recall"]

    write_params(tmp_path / "params.json", params)
    assert read_params(tmp_path / "params.json") == params


def test_make_holdout_queries_shapes(rng):
    x = rng.standard_normal((100, 8)).astype(np.float32)
    q = make_holdout_queries(x, 20, seed=3)
    assert q.shape == (20, 8)
    q2 = make_holdout_queries(x, 500)
    assert q2.shape == (100, 8)  # capped at corpus size
