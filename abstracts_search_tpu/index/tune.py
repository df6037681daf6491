"""Search-time parameter autotuning -> params.json.

Replaces faiss `ParameterSpace` autotune behind `sidecar-search index
tune` (SURVEY.md §2 #8; reference Makefile:30-32, artifact
`params.json` Makefile:12): sweep ``nprobe`` operating points on
held-out queries, measuring recall@k against the exact flat oracle
(SURVEY.md §7 step 9 — the flat index doubles as ground truth) and
wall-clock QPS, then pick the cheapest point meeting the recall target.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

from ..parallel.mesh import build_mesh
from .flat import FlatIndex

DEFAULT_NPROBES = (1, 2, 4, 8, 16, 32, 64, 128, 256)


def make_holdout_queries(
    vectors: np.ndarray, n_queries: int, *, noise: float = 0.0, seed: int = 0
) -> np.ndarray:
    """Held-out queries: sampled corpus rows, optionally perturbed."""
    rng = np.random.default_rng(seed)
    picks = rng.choice(len(vectors), size=min(n_queries, len(vectors)), replace=False)
    q = vectors[picks].astype(np.float32).copy()
    if noise > 0:
        q += noise * rng.standard_normal(q.shape).astype(np.float32)
    return q


def exact_ground_truth(vectors: np.ndarray, queries: np.ndarray, k: int, *, mesh=None,
                       chunk: int = 1024):
    """Top-k oracle via the exact flat index (streams; no O(N*Q) memory)."""
    mesh = mesh if mesh is not None else build_mesh()
    flat = FlatIndex(mesh, chunk=chunk)
    flat.add(vectors)
    return flat.search(queries, k)


def tune_index(
    index,
    vectors: np.ndarray,
    *,
    n_queries: int = 256,
    k: int = 10,
    target_recall: float = 0.95,
    nprobes=DEFAULT_NPROBES,
    seed: int = 0,
    timing_reps: int = 3,
) -> dict:
    """Sweep nprobe; return the params.json payload."""
    queries = make_holdout_queries(vectors, n_queries, seed=seed)
    if getattr(index, "spherical", False):
        queries /= np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    _, ref = exact_ground_truth(vectors, queries, k,
                                mesh=index.mesh, chunk=index.chunk)

    points = []
    for nprobe in nprobes:
        if nprobe > index.n_lists:
            break
        _, got = index.search(queries, k, nprobe=nprobe)  # compile + correctness
        recall = float(np.mean([
            len(set(got[i]) & set(ref[i])) / k for i in range(len(queries))
        ]))
        t0 = time.perf_counter()
        for _ in range(timing_reps):
            index.search(queries, k, nprobe=nprobe)
        dt = (time.perf_counter() - t0) / timing_reps
        points.append({
            "nprobe": int(nprobe),
            "recall": recall,
            "qps": len(queries) / dt,
            "ms_per_batch": dt * 1e3,
        })

    chosen = next((p for p in points if p["recall"] >= target_recall), None)
    if chosen is None:
        chosen = max(points, key=lambda p: p["recall"])
    return {
        "nprobe": chosen["nprobe"],
        "k": k,
        "target_recall": target_recall,
        "achieved_recall": chosen["recall"],
        "operating_points": points,
    }


def write_params(path: str | Path, params: dict) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(params, indent=2))


def read_params(path: str | Path) -> dict:
    return json.loads(Path(path).read_text())
