"""Encoder parameter checkpointing (orbax).

Checkpoint tier for model weights, alongside the reference's three data
tiers (store / events stamps / published datasets — SURVEY.md §5
checkpoint-resume): converted stella weights are saved once and restored
at serving/build startup without re-running torch conversion.
"""

from __future__ import annotations

from pathlib import Path

import jax


def save_params(directory: str | Path, params) -> None:
    import orbax.checkpoint as ocp

    path = Path(directory).resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, params, force=True)
    ckpt.wait_until_finished()


def load_params(directory: str | Path, *, sharding=None):
    """Restore a param tree; optionally placing leaves on `sharding`
    (a NamedSharding or a pytree of them) as they load."""
    import orbax.checkpoint as ocp

    path = Path(directory).resolve()
    ckpt = ocp.StandardCheckpointer()
    if sharding is None:
        return ckpt.restore(path)
    meta = ckpt.metadata(path).item_metadata
    if hasattr(sharding, "spec"):  # single sharding for every leaf
        target = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding), meta
        )
    else:
        target = jax.tree.map(
            lambda m, s: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=s), meta, sharding
        )
    return ckpt.restore(path, target)
