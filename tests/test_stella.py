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


def test_verify_conversion_gate(torch_tiny, tmp_path):
    """`convert-model --verify` (round-3 VERDICT next #5): the gate must
    PASS on a faithful conversion of the tiny golden model and FAIL
    loudly on a corrupted one — before any checkpoint is written."""
    from abstracts_search_tpu.config import Config
    from abstracts_search_tpu.models.embed import whitespace_tokenizer
    from abstracts_search_tpu.models.registry import (
        ConversionVerificationError,
        verify_conversion,
    )

    torch, model = torch_tiny
    scfg = StellaConfig.tiny()
    dense_w = np.random.default_rng(5).standard_normal(
        (scfg.mrl_dim, scfg.backbone.hidden_size)).astype(np.float32)
    params = {"params": convert_stella(
        model.state_dict(), scfg.backbone.num_layers, dense_w)}
    cfg = Config(model_name="tiny-test", embed_dim=scfg.mrl_dim)
    tok = whitespace_tokenizer(scfg.backbone.vocab_size)

    report = verify_conversion(cfg, scfg, params, model, dense_w,
                               tokenizer=tok)
    assert report["min_cosine"] > 0.999
    assert report["min_cosine_document"] > 0.999
    assert report["min_cosine_query"] > 0.999

    # corrupt the conversion (row-permuted MRL head — the transposed/
    # misordered-kernel bug class): the gate must catch it
    import copy

    bad = copy.deepcopy(params)
    k = bad["params"]["vector_linear"]["kernel"]
    bad["params"]["vector_linear"]["kernel"] = k[::-1].copy()
    with pytest.raises(ConversionVerificationError, match="cosine"):
        verify_conversion(cfg, scfg, bad, model, dense_w, tokenizer=tok)

    # prompt-registry drift: a snapshot dir publishing a DIFFERENT
    # s2p_query prompt must fail the byte check
    snap = tmp_path / "model"
    snap.mkdir()
    (snap / "config_sentence_transformers.json").write_text(
        '{"prompts": {"s2p_query": "Different instruction\\nQuery: "}}')
    cfg2 = Config(model_name=str(snap), embed_dim=scfg.mrl_dim)
    with pytest.raises(ConversionVerificationError, match="prompt registry"):
        verify_conversion(cfg2, scfg, params, model, dense_w, tokenizer=tok)
