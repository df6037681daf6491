"""Encoder parity tests: flax Qwen2 vs torch (transformers) at tiny size.

The real stella checkpoint is unreachable offline (SURVEY.md §7 step 4
calls for torch-vs-flax parity on a handful of texts); the same
conversion path (models/convert.py) is exercised here with a
randomly-initialized torch Qwen2Model as the oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from abstracts_search_tpu.models import (
    Qwen2Config,
    Qwen2Encoder,
    StellaConfig,
    StellaEncoder,
    PROMPTS,
)
from abstracts_search_tpu.models.convert import convert_qwen2_state_dict, convert_stella


@pytest.fixture(scope="module")
def torch_tiny():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFConfig, Qwen2Model

    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen2Model(hf_cfg)
    model.eval()
    return torch, model


def test_qwen2_parity_with_torch(torch_tiny):
    torch, model = torch_tiny
    cfg = Qwen2Config.tiny()

    rng = np.random.default_rng(0)
    B, T = 3, 12
    ids = rng.integers(0, cfg.vocab_size, size=(B, T))
    mask = np.ones((B, T), dtype=np.int64)
    mask[1, 8:] = 0  # padded row
    mask[2, 5:] = 0

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    params = {"params": convert_qwen2_state_dict(model.state_dict(), cfg.num_layers)}
    enc = Qwen2Encoder(cfg, causal=True)
    got = np.asarray(enc.apply(params, jnp.asarray(ids), jnp.asarray(mask)))

    # compare only real (unpadded) positions
    for b in range(B):
        t = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :t], ref[b, :t], rtol=2e-4, atol=2e-4)


def test_stella_encoder_shapes_and_norm(torch_tiny):
    torch, model = torch_tiny
    cfg = StellaConfig.tiny()

    dense_w = np.random.default_rng(1).standard_normal(
        (cfg.mrl_dim, cfg.backbone.hidden_size)
    ).astype(np.float32)
    params = {"params": convert_stella(model.state_dict(), cfg.backbone.num_layers, dense_w)}

    enc = StellaEncoder(cfg)
    ids = np.random.default_rng(2).integers(0, 128, size=(4, 10))
    mask = np.ones((4, 10), dtype=np.int32)
    mask[0, 6:] = 0
    emb = np.asarray(enc.apply(params, jnp.asarray(ids), jnp.asarray(mask)))

    assert emb.shape == (4, cfg.mrl_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)

    # pooling must ignore padding: changing padded tokens changes nothing
    ids2 = ids.copy()
    ids2[0, 6:] = (ids2[0, 6:] + 1) % 128
    emb2 = np.asarray(enc.apply(params, jnp.asarray(ids2), jnp.asarray(mask)))
    np.testing.assert_allclose(emb[0], emb2[0], atol=1e-6)


def test_stella_mean_pool_vs_manual(torch_tiny):
    """mean pooling == manual masked average of backbone states."""
    torch, model = torch_tiny
    cfg = StellaConfig.tiny()
    dense_w = np.eye(cfg.mrl_dim, cfg.backbone.hidden_size, dtype=np.float32)
    params = {"params": convert_stella(model.state_dict(), cfg.backbone.num_layers, dense_w)}

    ids = np.random.default_rng(3).integers(0, 128, size=(2, 8))
    mask = np.ones((2, 8), dtype=np.int32)
    mask[1, 3:] = 0

    backbone = Qwen2Encoder(cfg.backbone, causal=cfg.causal)
    hidden = np.asarray(
        backbone.apply({"params": params["params"]["backbone"]},
                       jnp.asarray(ids), jnp.asarray(mask))
    )
    manual = np.stack([
        hidden[0, :8].mean(axis=0)[: cfg.mrl_dim],
        hidden[1, :3].mean(axis=0)[: cfg.mrl_dim],
    ])
    manual /= np.linalg.norm(manual, axis=1, keepdims=True)

    enc = StellaEncoder(cfg)
    emb = np.asarray(enc.apply(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(emb, manual, rtol=1e-4, atol=1e-5)


def test_prompts_registry():
    assert PROMPTS["s2p_query"].startswith("Instruct: Given a web search query")
    assert PROMPTS["s2p_query"].endswith("Query: ")
    assert "s2s_query" in PROMPTS
