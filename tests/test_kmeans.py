"""Distributed k-means tests on the 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import pytest

from abstracts_search_tpu.index.kmeans import KMeans
from abstracts_search_tpu.parallel import build_mesh


def _blobs(rng, n_per, centers, dim, scale=0.05):
    cs = rng.standard_normal((centers, dim)).astype(np.float32)
    cs /= np.linalg.norm(cs, axis=1, keepdims=True)
    pts = np.repeat(cs, n_per, axis=0) + scale * rng.standard_normal(
        (centers * n_per, dim)
    ).astype(np.float32)
    return pts, cs


def test_kmeans_recovers_blobs(rng):
    pts, true_cs = _blobs(rng, n_per=50, centers=8, dim=16)
    km = KMeans(8, mesh=build_mesh(), chunk=128, seed=1)
    cs = km.fit(pts, iters=15)
    assert cs.shape == (8, 16)
    np.testing.assert_allclose(np.linalg.norm(cs, axis=1), 1.0, rtol=1e-5)
    # most true centers are recovered (Lloyd from random init can merge a
    # pair — that's a property of the algorithm, not the implementation)
    sims = (true_cs @ cs.T).max(axis=1)
    assert (sims > 0.98).sum() >= 6, sims
    assert sims.mean() > 0.95, sims


def test_kmeans_assign_consistency(rng):
    pts, _ = _blobs(rng, n_per=40, centers=4, dim=8)
    km = KMeans(4, mesh=build_mesh(), chunk=128, seed=0)
    km.fit(pts, iters=10)
    scores, assign = km.assign(pts)
    assert assign.shape == (len(pts),)
    assert assign.min() >= 0 and assign.max() < 4
    # assignment must equal the brute-force nearest centroid
    normed = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    brute = (normed @ km.centroids.T).argmax(axis=1)
    assert (assign == brute).mean() > 0.999


def test_kmeans_objective_improves(rng):
    pts, _ = _blobs(rng, n_per=30, centers=6, dim=12, scale=0.3)
    km = KMeans(6, mesh=build_mesh(), chunk=128, seed=2)
    km.fit(pts, iters=8)
    obj = km.stats["objective"]
    assert obj[-1] >= obj[0] - 1e-6  # spherical objective is maximized


def test_kmeans_empty_cluster_split(rng):
    # exact duplicates: all scores tie, argmax picks one centroid,
    # leaving the rest empty -> the split path must fire
    pts = np.ones((64, 8), np.float32)
    km = KMeans(16, mesh=build_mesh(), chunk=128, seed=0)
    km.fit(pts, iters=3)
    assert sum(km.stats["empty_splits"]) > 0  # splits happened
    scores, assign = km.assign(pts)
    assert assign.max() < 16


def test_kmeans_chunked_input_matches_array(rng):
    pts, _ = _blobs(rng, n_per=25, centers=4, dim=8)
    km1 = KMeans(4, mesh=build_mesh(), chunk=128, seed=3)
    c1 = km1.fit(pts, iters=5)
    km2 = KMeans(4, mesh=build_mesh(), chunk=128, seed=3)
    c2 = km2.fit([pts[:37], pts[37:]], iters=5, batch_rows=41)
    np.testing.assert_allclose(c1, c2, atol=1e-5)


def test_kmeans_requires_enough_rows():
    km = KMeans(100)
    with pytest.raises(ValueError):
        km.fit(np.zeros((10, 4), np.float32))


def test_kmeans_fit_staged_matches_fit(rng):
    """fit_staged (device-resident sample, the ivfpq 'device' train
    mode) must reproduce fit() on the same single-window sample."""
    from jax.sharding import PartitionSpec as P

    from abstracts_search_tpu.parallel.mesh import global_put

    n, d, k = 1200, 16, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    a = KMeans(k, mesh=build_mesh(), chunk=128, seed=3)
    a.fit(x, iters=4, batch_rows=n)

    b = KMeans(k, mesh=build_mesh(), chunk=128, seed=3)
    ndev = b.ndev
    per = ((n + ndev - 1) // ndev + 7) // 8 * 8
    total = per * ndev
    xp = np.zeros((total, d), np.float32)
    xp[:n] = x
    valid = np.zeros((total, 1), np.float32)
    valid[:n] = 1.0
    xj = global_put(xp, b.mesh, P("shard"))
    vj = global_put(valid, b.mesh, P("shard"))
    b.fit_staged(xj, vj, n, iters=4)

    np.testing.assert_allclose(a.centroids, b.centroids, rtol=1e-5, atol=1e-6)
