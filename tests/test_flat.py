"""FlatIndex: shard-parallel exact search on an 8-device CPU mesh.

Exercises the real SPMD path — shard_map, per-device streaming top-k, and
the all-gather merge over the mesh (SURVEY.md §4: multi-device tests via
xla_force_host_platform_device_count).
"""

import numpy as np

import jax

from abstracts_search_tpu.index import FlatIndex
from abstracts_search_tpu.parallel import build_mesh


def _ref_search(q, x, k):
    s = q @ x.T
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def test_mesh_uses_8_devices():
    assert len(jax.devices()) == 8


def test_flat_search_matches_exact(rng):
    n, d, q_n, k = 5000, 64, 16, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((q_n, d)).astype(np.float32)

    index = FlatIndex(build_mesh(), chunk=256)
    index.add(x)
    assert index.n == n and index.ndev == 8

    scores, pos = index.search(q, k)
    ref_scores, ref_pos = _ref_search(q, x, k)

    np.testing.assert_allclose(scores, ref_scores, rtol=1e-4, atol=1e-4)
    # positions must point at rows achieving the reference scores
    got = np.take_along_axis(q @ x.T, pos, axis=1)
    np.testing.assert_allclose(got, ref_scores, rtol=1e-4, atol=1e-4)
    assert np.all(pos < n)


def test_flat_search_uneven_corpus(rng):
    """Corpus not divisible by ndev*chunk: padding must never surface."""
    n, d, k = 777, 32, 20
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((4, d)).astype(np.float32)
    index = FlatIndex(build_mesh(), chunk=128)
    index.add(x)
    scores, pos = index.search(q, k)
    assert np.all(pos < n)
    assert np.all(np.isfinite(scores))
    ref_scores, _ = _ref_search(q, x, k)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-4, atol=1e-4)


def test_flat_add_incremental(rng):
    d = 16
    a = rng.standard_normal((100, d)).astype(np.float32)
    b = rng.standard_normal((50, d)).astype(np.float32)
    index = FlatIndex(build_mesh(), chunk=64)
    index.add(a)
    index.add(b)
    assert index.n == 150
    q = rng.standard_normal((2, d)).astype(np.float32)
    scores, pos = index.search(q, 5)
    ref_scores, _ = _ref_search(q, np.concatenate([a, b]), 5)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-4, atol=1e-4)
