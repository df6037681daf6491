"""Encoder checkpoint round trip (orbax)."""

import numpy as np

import jax
import jax.numpy as jnp

from abstracts_search_tpu.models import StellaConfig, StellaEncoder
from abstracts_search_tpu.models.checkpoint import load_params, save_params


def test_params_roundtrip(tmp_path):
    cfg = StellaConfig.tiny()
    model = StellaEncoder(cfg)
    ids = jnp.zeros((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.key(0), ids, mask)
    out1 = np.asarray(model.apply(params, ids, mask))

    save_params(tmp_path / "ckpt", params)
    restored = load_params(tmp_path / "ckpt")
    out2 = np.asarray(model.apply(restored, ids, mask))
    np.testing.assert_array_equal(out1, out2)

    chex = jax.tree.map(lambda a, b: np.array_equal(a, b), params, restored)
    assert all(jax.tree.leaves(chex))
