"""stella_en_1.5B_v5 sentence encoder: Qwen2 backbone + pooling + MRL head.

Capability parity with the reference's encoder component (SURVEY.md §2
#5: `NovaSearch/stella_en_1.5B_v5`, query prompt `s2p_query`, corpus
documents embedded without a prompt; reference README.md:28,60). The
published corpus uses the 1024-d MRL projection (SURVEY.md §7 "207M x
1024-d").

Pipeline: tokens -> Qwen2 hidden states -> masked mean pooling ->
Dense(hidden -> mrl_dim) -> L2 normalize. Pooling mode and causal
masking are configurable; conversion of real HF weights (torch state
dict + the sentence-transformers `2_Dense_<d>` module) lives in
models/convert.py. With no network in this environment, functional
parity is proven against a randomly-initialized torch Qwen2 at tiny
size (tests/test_stella.py); real-weight fidelity is validated by the
same conversion path once checkpoints are present.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from .qwen2 import Qwen2Config, Qwen2Encoder

# Prompt registry (stella's config_sentence_transformers.json prompts;
# the serving env var PROMPT_NAME selects one — reference README.md:28).
PROMPTS = {
    "s2p_query": (
        "Instruct: Given a web search query, retrieve relevant passages "
        "that answer the query.\nQuery: "
    ),
    "s2s_query": "Instruct: Retrieve semantically similar text.\nQuery: ",
}


@dataclasses.dataclass(frozen=True)
class StellaConfig:
    backbone: Qwen2Config = dataclasses.field(default_factory=Qwen2Config.stella_1_5b)
    mrl_dim: int = 1024          # published MRL heads: 512..8192; corpus uses 1024
    pooling: str = "mean"        # "mean" | "last" | "cls"
    causal: bool = True
    normalize: bool = True

    @staticmethod
    def tiny(**kw) -> "StellaConfig":
        defaults = dict(backbone=Qwen2Config.tiny(), mrl_dim=16)
        defaults.update(kw)
        return StellaConfig(**defaults)


def pool_hidden(hidden, attention_mask, mode: str):
    """Masked pooling over the sequence axis. hidden [B,T,H], mask [B,T]."""
    m = attention_mask.astype(hidden.dtype)
    if mode == "mean":
        s = jnp.sum(hidden * m[:, :, None], axis=1)
        cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        return s / cnt
    if mode == "last":
        # index of last real token per row
        idx = jnp.maximum(jnp.sum(attention_mask, axis=1) - 1, 0).astype(jnp.int32)
        return jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
    if mode == "cls":
        return hidden[:, 0]
    raise ValueError(f"unknown pooling mode {mode!r}")


class StellaEncoder(nn.Module):
    cfg: StellaConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        cfg = self.cfg
        hidden = Qwen2Encoder(cfg.backbone, causal=cfg.causal, name="backbone")(
            input_ids, attention_mask
        )
        pooled = pool_hidden(hidden, attention_mask, cfg.pooling)
        emb = nn.Dense(
            cfg.mrl_dim, use_bias=True,
            dtype=cfg.backbone.dtype, param_dtype=cfg.backbone.param_dtype,
            name="vector_linear",
        )(pooled)
        emb = emb.astype(jnp.float32)
        if cfg.normalize:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
            )
        return emb
