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


def test_kmeans_plain_l2_matches_numpy_lloyd(rng):
    """spherical=False is TRUE L2 k-means (round-4 VERDICT weak #6):
    assignments equal argmin ||x - c||^2 and centroids track a numpy
    Lloyd oracle run from the same init (well-separated anisotropic
    blobs with very different norms, where IP-assignment would differ)."""
    # blobs at radii 1, 5, 10, 20 — spherical/IP assignment collapses
    # or misgroups these; L2 separates them trivially
    radii = np.array([1.0, 5.0, 10.0, 20.0], np.float32)
    dirs = rng.standard_normal((4, 16)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    centers = dirs * radii[:, None]
    pts = np.repeat(centers, 64, axis=0) + 0.05 * rng.standard_normal(
        (256, 16)).astype(np.float32)

    km = KMeans(4, mesh=build_mesh(), spherical=False, chunk=128, seed=3)
    cs = km.fit(pts, iters=8)
    # centroids are NOT normalized in L2 mode
    norms = np.sort(np.linalg.norm(cs, axis=1))
    assert norms[-1] > 15.0 and norms[0] < 2.0, norms

    # numpy Lloyd oracle with the same init rows
    init_idx = np.sort(np.random.default_rng(3).choice(256, 4, replace=False))
    oc = pts[init_idx].copy()
    for _ in range(8):
        d2 = ((pts[:, None, :] - oc[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        for j in range(4):
            if (a == j).any():
                oc[j] = pts[a == j].mean(0)
    # same partition (up to centroid order)
    sims = -((oc[:, None, :] - cs[None, :, :]) ** 2).sum(-1)
    match = sims.argmax(1)
    assert len(set(match.tolist())) == 4
    np.testing.assert_allclose(cs[match], oc, atol=0.15)

    # assign() == argmin L2 for fresh points
    probe = centers + 0.02 * rng.standard_normal((4, 16)).astype(np.float32)
    _, got = km.assign(probe)
    want = ((probe[:, None, :] - cs[None, :, :]) ** 2).sum(-1).argmin(1)
    np.testing.assert_array_equal(got, want)


def test_kmeans_l2_differs_from_spherical_on_norms(rng):
    """Sanity: on norm-separated data the two modes really partition
    differently (guards against the L2 path silently normalizing)."""
    dirs = np.ones((2, 8), np.float32) / np.sqrt(8)
    centers = np.stack([dirs[0] * 1.0, dirs[1] * 30.0])  # same direction!
    pts = np.repeat(centers, 32, axis=0) + 0.05 * rng.standard_normal(
        (64, 8)).astype(np.float32)
    km = KMeans(2, mesh=build_mesh(), spherical=False, chunk=128, seed=0)
    km.fit(pts, iters=6)
    _, a = km.assign(pts)
    # L2 separates radius-1 from radius-30 despite identical direction
    assert len(set(a[:32].tolist())) == 1
    assert len(set(a[32:].tolist())) == 1
    assert a[0] != a[-1]
