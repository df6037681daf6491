"""Generate the stella golden-vector fixture (run ONCE, needs torch).

Builds the deterministic tiny torch Qwen2 used by tests/test_stella.py,
converts it through models/convert.py, verifies the flax embedding
against a manually-pooled torch forward, then freezes (params, tokens,
expected embeddings) into stella_tiny_golden.npz. The regression test
(tests/test_encoder_lifecycle.py) replays the flax forward against this
fixture WITHOUT torch — conversion/model drift fails it offline.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tests/fixtures/gen_golden.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import torch
from transformers import Qwen2Config as HFConfig, Qwen2Model

import jax.numpy as jnp

from abstracts_search_tpu.models import StellaConfig, StellaEncoder
from abstracts_search_tpu.models.convert import convert_stella


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def main() -> None:
    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen2Model(hf_cfg)
    model.eval()

    cfg = StellaConfig.tiny()
    rng = np.random.default_rng(7)
    dense_w = rng.standard_normal((cfg.mrl_dim, cfg.backbone.hidden_size)).astype(np.float32)
    params = {"params": convert_stella(model.state_dict(), cfg.backbone.num_layers, dense_w)}

    ids = rng.integers(0, 128, size=(4, 12))
    mask = np.ones((4, 12), dtype=np.int32)
    mask[1, 7:] = 0
    mask[3, 4:] = 0

    enc = StellaEncoder(cfg)
    emb = np.asarray(enc.apply(params, jnp.asarray(ids), jnp.asarray(mask)))

    # sanity: the flax embedding equals torch-pooled + dense + normalize
    with torch.no_grad():
        hidden = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask.astype(np.int64))
        ).last_hidden_state.numpy()
    m = mask[:, :, None].astype(np.float32)
    pooled = (hidden * m).sum(1) / np.maximum(mask.sum(1, keepdims=True), 1)
    ref = pooled @ dense_w.T
    ref /= np.linalg.norm(ref, axis=1, keepdims=True)
    np.testing.assert_allclose(emb, ref, rtol=5e-4, atol=5e-4)

    flat = flatten(params["params"])
    out = Path(__file__).with_name("stella_tiny_golden.npz")
    np.savez_compressed(out, __ids__=ids, __mask__=mask, __emb__=emb, **flat)
    print(f"wrote {out} ({out.stat().st_size} bytes, {len(flat)} param leaves)")


if __name__ == "__main__":
    main()
