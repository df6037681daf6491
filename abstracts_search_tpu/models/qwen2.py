"""Qwen2 transformer backbone in flax (the stella_en_1.5B_v5 base).

stella_en_1.5B_v5 is a Qwen2-1.5B-based sentence encoder (SURVEY.md §2
#5). This is a from-scratch flax implementation of the Qwen2
architecture: RMSNorm, rotary position embeddings (HF rotate-half
convention), grouped-query attention with q/k/v projection biases, and a
SwiGLU MLP — shapes and naming chosen so torch checkpoints convert
mechanically (models/convert.py).

TPU notes: all matmuls run in a configurable compute dtype (bfloat16 on
TPU) with f32 softmax and f32 RMSNorm statistics; attention is the
stock einsum formulation, which XLA fuses and tiles onto the MXU — no
data-dependent shapes anywhere, so one compile per (batch, seqlen)
bucket (models/embed.py buckets inputs for exactly this reason).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 151_646
    hidden_size: int = 1536
    intermediate_size: int = 8960
    num_layers: int = 28
    num_heads: int = 12
    num_kv_heads: int = 2
    head_dim: int = 128
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    dtype: Any = jnp.float32          # compute dtype (bf16 on TPU)
    param_dtype: Any = jnp.float32

    @staticmethod
    def stella_1_5b(**kw) -> "Qwen2Config":
        return Qwen2Config(**kw)

    @staticmethod
    def tiny(**kw) -> "Qwen2Config":
        defaults = dict(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
            rope_theta=10_000.0,
        )
        defaults.update(kw)
        return Qwen2Config(**defaults)


class RMSNorm(nn.Module):
    eps: float
    dtype: Any

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(self.dtype)


def _rope_cos_sin(positions, head_dim, theta, dtype):
    """HF-convention rotary tables: [T, head_dim] with duplicated halves."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [T, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)                      # [T, hd]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_rope(x, cos, sin):
    # x: [B, T, H, hd]; cos/sin: [T, hd]
    return x * cos[None, :, None, :] + _rotate_half(x) * sin[None, :, None, :]


class Attention(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x, mask_bias, cos, sin):
        cfg = self.cfg
        b, t, _ = x.shape
        h, kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        dense = lambda feat, bias, name: nn.Dense(
            feat, use_bias=bias, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name
        )
        q = dense(h * hd, True, "q_proj")(x).reshape(b, t, h, hd)
        k = dense(kv * hd, True, "k_proj")(x).reshape(b, t, kv, hd)
        v = dense(kv * hd, True, "v_proj")(x).reshape(b, t, kv, hd)

        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)

        # GQA: repeat kv heads up to query heads
        rep = h // kv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

        scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(hd))
        scores = scores + mask_bias  # [B, 1, T, T] additive -inf mask
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)

        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, h * hd)
        return dense(cfg.hidden_size, False, "o_proj")(out)


class MLP(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dense = lambda feat, name: nn.Dense(
            feat, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name
        )
        gate = dense(cfg.intermediate_size, "gate_proj")(x)
        up = dense(cfg.intermediate_size, "up_proj")(x)
        return dense(cfg.hidden_size, "down_proj")(nn.silu(gate) * up)


class Block(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x, mask_bias, cos, sin):
        cfg = self.cfg
        h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="input_layernorm")(x)
        x = x + Attention(cfg, name="self_attn")(h, mask_bias, cos, sin)
        h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="post_attention_layernorm")(x)
        return x + MLP(cfg, name="mlp")(h)


class Qwen2Encoder(nn.Module):
    """Token ids -> final hidden states [B, T, hidden]."""

    cfg: Qwen2Config
    causal: bool = True

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        cfg = self.cfg
        b, t = input_ids.shape

        embed = nn.Embed(
            cfg.vocab_size, cfg.hidden_size,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="embed_tokens",
        )
        x = embed(input_ids)

        positions = jnp.arange(t)
        cos, sin = _rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, cfg.dtype)

        # additive mask: padding always; causal optionally
        pad = attention_mask[:, None, None, :].astype(jnp.bool_)   # [B,1,1,S]
        allow = pad
        if self.causal:
            tri = jnp.tril(jnp.ones((t, t), jnp.bool_))[None, None, :, :]
            allow = jnp.logical_and(allow, tri)
        mask_bias = jnp.where(allow, 0.0, jnp.float32(-1e9))

        for i in range(cfg.num_layers):
            x = Block(cfg, name=f"layers_{i}")(x, mask_bias, cos, sin)

        return RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="norm")(x)
