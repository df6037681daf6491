"""TP sharding rules produce valid, shape-compatible PartitionSpecs."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from abstracts_search_tpu.models import StellaConfig, StellaEncoder
from abstracts_search_tpu.parallel import build_mesh
from abstracts_search_tpu.parallel.mesh import TP_AXIS
from abstracts_search_tpu.parallel.sharding import stella_param_specs, stella_param_shardings


def test_specs_cover_tree_and_divide_shapes():
    cfg = StellaConfig.tiny()
    model = StellaEncoder(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32))
    specs = stella_param_specs(params)

    flat_p, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_s = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert len(flat_p) == len(flat_s)

    tp = 2
    n_tp_sharded = 0
    for (path, leaf), spec in zip(flat_p, flat_s):
        for dim, axis in enumerate(spec):
            if axis == TP_AXIS:
                n_tp_sharded += 1
                assert leaf.shape[dim] % tp == 0, (path, leaf.shape, spec)
    # attention qkv/o + mlp gate/up/down kernels (+ qkv biases) per layer
    assert n_tp_sharded == cfg.backbone.num_layers * 10


def test_sharded_forward_matches_replicated():
    mesh = build_mesh(tp=2)
    cfg = StellaConfig.tiny()
    model = StellaEncoder(cfg)
    ids = jnp.zeros((4, 8), jnp.int32)
    mask = jnp.ones((4, 8), jnp.int32)
    params = model.init(jax.random.key(0), ids, mask)

    base = np.asarray(model.apply(params, ids, mask))

    shardings = stella_param_shardings(params, mesh)
    params_sh = jax.device_put(params, shardings)
    out = np.asarray(jax.jit(model.apply)(params_sh, ids, mask))
    np.testing.assert_allclose(out, base, atol=1e-5)


def test_global_put_callback_path_matches_device_put():
    """The multi-controller install path (make_array_from_callback) must
    produce the same sharded array as plain device_put; exercised here
    single-process by calling the callback path directly."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from abstracts_search_tpu.parallel.mesh import SHARD_AXIS, build_mesh

    mesh = build_mesh()
    x = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    for spec in (P(SHARD_AXIS), P()):
        sh = NamedSharding(mesh, spec)
        a = jax.device_put(x, sh)
        b = jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])
        assert a.sharding == b.sharding
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
