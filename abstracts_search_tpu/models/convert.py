"""torch -> flax weight conversion for Qwen2/stella checkpoints.

Maps a HF torch state dict (keys like `layers.0.self_attn.q_proj.weight`)
onto the flax parameter tree of models/qwen2.py + models/stella.py.
Torch Linear stores [out, in]; flax Dense kernels are [in, out], so
weights are transposed. The sentence-transformers MRL head ships as a
separate `2_Dense_<d>` module (`linear.weight`/`linear.bias`) and lands
on `vector_linear`.

Works with any mapping of name -> array-like (a torch state_dict, a
numpy dict, or safetensors); torch is only touched by the caller.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def convert_qwen2_state_dict(sd: Mapping[str, object], num_layers: int) -> dict:
    """HF Qwen2Model state dict -> flax params for Qwen2Encoder."""
    p: dict = {"embed_tokens": {"embedding": _np(sd["embed_tokens.weight"])}}

    def dense(prefix: str, bias: bool) -> dict:
        out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
        if bias:
            out["bias"] = _np(sd[f"{prefix}.bias"])
        return out

    for i in range(num_layers):
        lp = f"layers.{i}"
        p[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": dense(f"{lp}.self_attn.q_proj", True),
                "k_proj": dense(f"{lp}.self_attn.k_proj", True),
                "v_proj": dense(f"{lp}.self_attn.v_proj", True),
                "o_proj": dense(f"{lp}.self_attn.o_proj", False),
            },
            "mlp": {
                "gate_proj": dense(f"{lp}.mlp.gate_proj", False),
                "up_proj": dense(f"{lp}.mlp.up_proj", False),
                "down_proj": dense(f"{lp}.mlp.down_proj", False),
            },
            "input_layernorm": {"scale": _np(sd[f"{lp}.input_layernorm.weight"])},
            "post_attention_layernorm": {
                "scale": _np(sd[f"{lp}.post_attention_layernorm.weight"])
            },
        }
    p["norm"] = {"scale": _np(sd["norm.weight"])}
    return p


def convert_stella(
    backbone_sd: Mapping[str, object],
    num_layers: int,
    dense_weight,
    dense_bias=None,
) -> dict:
    """Full stella params: backbone + the `2_Dense_<d>` MRL head."""
    head = {"kernel": _np(dense_weight).T}
    head["bias"] = (
        _np(dense_bias)
        if dense_bias is not None
        else np.zeros(head["kernel"].shape[1], np.float32)
    )
    return {
        "backbone": convert_qwen2_state_dict(backbone_sd, num_layers),
        "vector_linear": head,
    }
