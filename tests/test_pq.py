"""PQ / OPQ: codebook training, encode/decode, rotation improves MSE."""

import numpy as np
import pytest

from abstracts_search_tpu.index.opq import OPQ
from abstracts_search_tpu.index.pq import ProductQuantizer
from abstracts_search_tpu.parallel import build_mesh


def _data(rng, n, d, correlated=False):
    x = rng.standard_normal((n, d)).astype(np.float32)
    if correlated:
        # correlated dims make the identity-subspace split suboptimal,
        # which is exactly what OPQ is supposed to fix
        mix = rng.standard_normal((d, d)).astype(np.float32)
        mix += 3 * np.eye(d, dtype=np.float32)
        scale = np.linspace(2.0, 0.1, d).astype(np.float32)
        x = (x * scale) @ mix
    return x


def test_pq_train_encode_decode(rng):
    d, m, nbits = 32, 8, 4
    x = _data(rng, 2000, d)
    pq = ProductQuantizer(d, m, nbits, mesh=build_mesh(), seed=0)
    pq.train(x, iters=10)
    assert pq.centroids.shape == (m, 1 << nbits, d // m)

    codes = pq.encode(x[:100])
    assert codes.shape == (100, m) and codes.dtype == np.uint8
    assert codes.max() < (1 << nbits)

    # quantization reduces variance substantially vs zero-codebook
    mse = pq.reconstruction_mse(x[:500])
    var = float(np.mean(np.square(x[:500])))
    assert mse < 0.5 * var, (mse, var)

    # training error decreases monotonically (Lloyd property)
    errs = pq.stats["mse"]
    assert all(errs[i + 1] <= errs[i] + 1e-9 for i in range(len(errs) - 1))


def test_pq_encode_is_nearest_codeword(rng):
    d, m, nbits = 16, 4, 4
    x = _data(rng, 600, d)
    pq = ProductQuantizer(d, m, nbits, mesh=build_mesh(), seed=1)
    pq.train(x, iters=8)
    codes = pq.encode(x[:50])
    xs = x[:50].reshape(50, m, d // m)
    for mi in range(m):
        d2 = ((xs[:, mi, None, :] - pq.centroids[mi][None]) ** 2).sum(-1)
        np.testing.assert_array_equal(codes[:, mi], d2.argmin(1).astype(np.uint8))


def test_pq_validates_args():
    with pytest.raises(ValueError):
        ProductQuantizer(30, 8)  # 30 % 8 != 0
    pq = ProductQuantizer(16, 4, 4)
    with pytest.raises(ValueError):
        pq.train(np.zeros((3, 16), np.float32))  # fewer rows than ksub


def test_opq_improves_on_pq_for_correlated_data(rng):
    d, m, nbits = 32, 8, 4
    x = _data(rng, 3000, d, correlated=True)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    pq = ProductQuantizer(d, m, nbits, mesh=build_mesh(), seed=0)
    pq.train(x, iters=8)
    mse_pq = pq.reconstruction_mse(x)

    opq = OPQ(d, m, nbits, mesh=build_mesh(), seed=0)
    opq.train(x, outer_iters=4, pq_iters=8)
    xr = opq.apply(x)
    mse_opq = float(np.mean(np.square(xr - opq.pq.decode(opq.pq.encode(xr)))))

    assert mse_opq < mse_pq * 0.95, (mse_opq, mse_pq)
    # rotation is orthogonal
    rtr = opq.rotation.T @ opq.rotation
    np.testing.assert_allclose(rtr, np.eye(d), atol=1e-4)


def test_opq_decode_unrotated_roundtrip(rng):
    d, m = 16, 4
    x = _data(rng, 800, d)
    opq = OPQ(d, m, 4, mesh=build_mesh())
    opq.train(x, outer_iters=2, pq_iters=6)
    codes = opq.encode(x[:20])
    back = opq.decode_unrotated(codes)
    # unrotated reconstruction error ~= rotated-space error (R orthogonal)
    err = np.mean(np.square(back - x[:20]))
    xr = opq.apply(x[:20])
    err_rot = np.mean(np.square(opq.pq.decode(codes) - xr))
    np.testing.assert_allclose(err, err_rot, rtol=1e-3)


def test_pq_train_staged_matches_host(rng):
    """train_staged (device-resident rows, the OPQ inner-loop path) must
    reproduce train() given the same seed: same init rows, same Lloyd
    arithmetic, only the staging differs."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from abstracts_search_tpu.parallel import build_mesh
    from abstracts_search_tpu.parallel.mesh import global_put

    n, dim, m = 512, 32, 8
    x = rng.standard_normal((n, dim)).astype(np.float32)

    a = ProductQuantizer(dim, m, 4, mesh=build_mesh(), seed=5)
    a.train(x, iters=4)

    b = ProductQuantizer(dim, m, 4, mesh=build_mesh(), seed=5)
    ndev = b.ndev
    per = ((n + ndev - 1) // ndev + 7) // 8 * 8
    total = per * ndev
    xp = np.zeros((total, dim), np.float32)
    xp[:n] = x
    valid = np.zeros((total, 1), np.float32)
    valid[:n] = 1.0
    xj3 = global_put(xp.reshape(total, m, dim // m), b.mesh, P("shard"))
    vj = global_put(valid, b.mesh, P("shard"))
    b.train_staged(xj3, vj, n, iters=4)

    np.testing.assert_allclose(a.centroids, b.centroids, rtol=1e-5, atol=1e-6)
