"""streaming_topk kernel tests vs a numpy exact reference (SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from abstracts_search_tpu.ops.topk import streaming_topk


def _ref_topk(q, x, n_valid, k):
    s = q @ x[:n_valid].T
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(s, idx, axis=1)
    return vals, idx


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
def test_streaming_topk_large_k_fori_branch(rng, impl):
    """k > 16 exercises the fori_loop merge (the unroll blew VMEM at k>=64)."""
    Q, D, N, k, chunk = 4, 16, 256, 32, 64
    q = rng.standard_normal((Q, D)).astype(np.float32)
    x = rng.standard_normal((N, D)).astype(np.float32)
    v, i = streaming_topk(jnp.asarray(q), jnp.asarray(x), jnp.int32(N), k,
                          chunk=chunk, impl=impl)
    rv, ri = _ref_topk(q, x, N, k)
    np.testing.assert_allclose(np.asarray(v), rv, rtol=1e-5, atol=1e-5)
    got_scores = np.take_along_axis(q @ x.T, np.asarray(i), axis=1)
    np.testing.assert_allclose(got_scores, rv, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
@pytest.mark.parametrize("n_valid", [512, 400, 129])
def test_streaming_topk_matches_exact(rng, impl, n_valid):
    Q, D, N, k, chunk = 8, 32, 512, 10, 128
    q = rng.standard_normal((Q, D)).astype(np.float32)
    x = np.zeros((N, D), dtype=np.float32)
    x[:n_valid] = rng.standard_normal((n_valid, D)).astype(np.float32)

    v, i = streaming_topk(jnp.asarray(q), jnp.asarray(x), jnp.int32(n_valid), k,
                          chunk=chunk, impl=impl)
    rv, ri = _ref_topk(q, x, n_valid, k)

    np.testing.assert_allclose(np.asarray(v), rv, rtol=1e-5, atol=1e-5)
    # indices may differ on exact ties; verify scores at returned indices
    got_scores = np.take_along_axis(q @ x.T, np.asarray(i), axis=1)
    np.testing.assert_allclose(got_scores, rv, rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(i) < n_valid)


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
def test_streaming_topk_k_gt_valid(rng, impl):
    """k larger than n_valid: padding slots come back as -inf."""
    Q, D, N, k, chunk = 4, 16, 128, 16, 128
    n_valid = 5
    q = rng.standard_normal((Q, D)).astype(np.float32)
    x = np.zeros((N, D), dtype=np.float32)
    x[:n_valid] = rng.standard_normal((n_valid, D)).astype(np.float32)
    v, i = streaming_topk(jnp.asarray(q), jnp.asarray(x), jnp.int32(n_valid), k,
                          chunk=chunk, impl=impl)
    v = np.asarray(v)
    assert np.all(np.isfinite(v[:, :n_valid]))
    assert np.all(np.isneginf(v[:, n_valid:]))


def test_streaming_topk_validates_args(rng):
    q = jnp.zeros((2, 8))
    x = jnp.zeros((100, 8))
    with pytest.raises(ValueError):
        streaming_topk(q, x, jnp.int32(100), 5, chunk=64)  # 100 % 64 != 0
    with pytest.raises(ValueError):
        streaming_topk(q, jnp.zeros((64, 8)), jnp.int32(64), 65, chunk=64)  # k > chunk


# ---- fast mode (packed-key selection; round-3) ----


@pytest.mark.parametrize("k", [1, 10, 24])
def test_fast_mode_impls_match_exactly(rng, k):
    """pallas-interpret and xla fast modes implement IDENTICAL packing/
    tie-break semantics -> bit-equal outputs."""
    Q, D, N, chunk = 6, 32, 1024, 256
    q = rng.standard_normal((Q, D)).astype(np.float32)
    x = rng.standard_normal((N, D)).astype(np.float32)
    n_valid = 900
    v_x, i_x = streaming_topk(jnp.asarray(q), jnp.asarray(x),
                              jnp.int32(n_valid), k, chunk=chunk,
                              impl="xla", mode="fast")
    v_p, i_p = streaming_topk(jnp.asarray(q), jnp.asarray(x),
                              jnp.int32(n_valid), k, chunk=chunk,
                              impl="pallas_interpret", mode="fast")
    np.testing.assert_array_equal(np.asarray(v_x), np.asarray(v_p))
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_p))


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
def test_fast_mode_close_to_exact_oracle(rng, impl):
    """Fast-mode values are within the documented 2^-12 relative
    truncation of the exact oracle, and the score at each returned
    index matches the returned value."""
    Q, D, N, k, chunk = 5, 24, 2048, 10, 512
    q = rng.standard_normal((Q, D)).astype(np.float32)
    x = rng.standard_normal((N, D)).astype(np.float32)
    ref = np.sort(q @ x.T, axis=1)[:, ::-1][:, :k]
    v, i = streaming_topk(jnp.asarray(q), jnp.asarray(x), jnp.int32(N), k,
                          chunk=chunk, impl=impl, mode="fast")
    v, i = np.asarray(v), np.asarray(i)
    np.testing.assert_allclose(v, ref, rtol=3e-4, atol=3e-4)
    got = np.take_along_axis(q @ x.T, i, axis=1)
    np.testing.assert_allclose(got, v, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
def test_fast_mode_invalid_rows_are_neginf(rng, impl):
    """The finite in-kernel sentinel must come back as -inf (contract
    parity with exact mode; tune's stream oracle checks v == -inf)."""
    Q, D, N, k, chunk = 3, 16, 256, 16, 128
    n_valid = 6
    q = rng.standard_normal((Q, D)).astype(np.float32)
    x = np.zeros((N, D), dtype=np.float32)
    x[:n_valid] = rng.standard_normal((n_valid, D)).astype(np.float32)
    v, i = streaming_topk(jnp.asarray(q), jnp.asarray(x), jnp.int32(n_valid),
                          k, chunk=chunk, impl=impl, mode="fast")
    v = np.asarray(v)
    assert np.all(np.isfinite(v[:, :n_valid]))
    assert np.all(np.isneginf(v[:, n_valid:]))
    assert np.all(np.asarray(i)[:, :n_valid] < n_valid)


def test_fast_mode_rejects_non_pow2_chunk(rng):
    q = jnp.zeros((2, 8))
    x = jnp.zeros((300, 8))
    with pytest.raises(ValueError, match="power-of-two"):
        streaming_topk(q, x, jnp.int32(300), 5, chunk=100, mode="fast")


def test_f32_operands_request_highest_precision():
    """The suite pins jax_default_matmul_precision=highest (conftest),
    so every numerical test would still pass if the f32->HIGHEST
    plumbing were silently reverted — on the real TPU the default would
    then run f32 dots as bf16 passes again (round-5 review finding).
    Assert the request is actually in the traced program."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from abstracts_search_tpu.ops.topk import _f32_precision, streaming_topk

    assert _f32_precision(jnp.zeros((1,), jnp.float32)) == lax.Precision.HIGHEST
    assert _f32_precision(jnp.zeros((1,), jnp.bfloat16)) is None

    q = jnp.zeros((8, 128), jnp.float32)
    x = jnp.zeros((256, 128), jnp.float32)
    # trace under DEFAULT global precision — conftest's global highest
    # would stamp every dot and make both assertions vacuous
    with jax.default_matmul_precision("default"):
        jaxpr = jax.make_jaxpr(
            lambda q, x: streaming_topk(q, x, jnp.int32(256), 4,
                                        chunk=128, impl="xla"))(q, x)
        qb, xb = q.astype(jnp.bfloat16), x.astype(jnp.bfloat16)
        jaxpr_b = jax.make_jaxpr(
            lambda q, x: streaming_topk(q, x, jnp.int32(256), 4,
                                        chunk=128, impl="xla"))(qb, xb)
    assert "HIGHEST" in str(jaxpr)        # f32: explicitly requested
    assert "HIGHEST" not in str(jaxpr_b)  # bf16: keeps the fast default
