"""Parameter sharding rules (tensor parallelism) for the encoder.

Megatron-style TP over the mesh's ``tp`` axis: attention q/k/v kernels
column-sharded, o_proj row-sharded; MLP gate/up column-, down
row-sharded. XLA inserts the (all-reduce) collectives. Embedding,
norms and the MRL head stay replicated — they are small next to the
28-layer 1.5B backbone.

Used with `jax.jit(model.apply, in_shardings=(specs, dp, dp))`: batch
data-parallel over ``shard``, weights TP over ``tp`` — the standard
2-D serving layout for the corpus-embed stage.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import TP_AXIS

_COL = ("q_proj/kernel", "k_proj/kernel", "v_proj/kernel",
        "gate_proj/kernel", "up_proj/kernel")
_ROW = ("o_proj/kernel", "down_proj/kernel")
_COL_BIAS = ("q_proj/bias", "k_proj/bias", "v_proj/bias")


def stella_param_specs(params) -> object:
    """PyTree of PartitionSpecs matching the stella/Qwen2 param tree."""

    def spec(path, leaf):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if any(p.endswith(s) for s in _COL):
            return P(None, TP_AXIS)
        if any(p.endswith(s) for s in _ROW):
            return P(TP_AXIS, None)
        if any(p.endswith(s) for s in _COL_BIAS):
            return P(TP_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def stella_param_shardings(params, mesh: Mesh):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), stella_param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )
