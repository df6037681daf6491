"""Embedder registry: pick the embedding backend by name.

- ``stella``      : the real flax stella encoder; needs HF-cached weights
                    (converted via models/convert.py) — the production
                    path, replacing `SIDECARSEARCH_MODEL=...` torch embed
                    (reference README.md:60).
- ``hash``        : deterministic offline embedder (seeded Gaussian per
                    text). Zero-egress environments (like this one) and
                    pipeline tests use it — every stage downstream of
                    embedding is exercised for real.

An embedder is `texts -> np.ndarray [n, dim] float32` with an optional
`queries(texts)` variant that applies the s2p_query prompt.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np

from ..config import Config

logger = logging.getLogger(__name__)


class HashEmbedder:
    """Deterministic pseudo-embedder for offline runs and tests."""

    def __init__(self, dim: int):
        self.dim = dim

    def _one(self, text: str) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha1(text.encode()).digest()[:8], "little")
        v = np.random.default_rng(seed).standard_normal(self.dim).astype(np.float32)
        return v / np.linalg.norm(v)

    def __call__(self, texts) -> np.ndarray:
        if len(texts) == 0:
            return np.zeros((0, self.dim), np.float32)
        return np.stack([self._one(t) for t in texts])

    def queries(self, texts) -> np.ndarray:
        # prompting is meaningless for a hash embedder; corpus == query space
        return self(texts)


class StellaEmbedder:
    """Full stella pipeline (tokenize + flax forward on the mesh)."""

    def __init__(self, cfg: Config, mesh=None):
        from .convert import convert_stella
        from .embed import EmbeddingPipeline, load_hf_tokenizer
        from .stella import StellaConfig

        import torch  # local weights only; no network
        from transformers import AutoModel

        model = AutoModel.from_pretrained(cfg.model_name, trust_remote_code=cfg.trust_remote_code)
        sd = model.state_dict()
        scfg = StellaConfig(mrl_dim=cfg.embed_dim)
        # stella ships the MRL head as a sentence-transformers Dense
        # module; when absent fall back to an identity-truncation head.
        dense_w = sd.get("vector_linear.weight")
        if dense_w is None:
            dense_w = np.eye(cfg.embed_dim, scfg.backbone.hidden_size, dtype=np.float32)
        params = {"params": convert_stella(
            {k: v for k, v in sd.items()}, scfg.backbone.num_layers, dense_w,
            sd.get("vector_linear.bias"),
        )}
        self.pipeline = EmbeddingPipeline(
            scfg, params, load_hf_tokenizer(cfg.model_name),
            batch_size=cfg.embed_batch, mesh=mesh,
        )
        self.dim = cfg.embed_dim

    def __call__(self, texts) -> np.ndarray:
        return self.pipeline(texts)

    def queries(self, texts) -> np.ndarray:
        return self.pipeline.embed_queries(texts)


def get_embedder(name: str, cfg: Config, mesh=None):
    if name == "hash":
        return HashEmbedder(cfg.embed_dim)
    if name == "stella":
        return StellaEmbedder(cfg, mesh=mesh)
    if name == "auto":
        try:
            return StellaEmbedder(cfg, mesh=mesh)
        except Exception as e:  # no local weights / no network
            logger.warning("stella unavailable (%s); falling back to hash embedder", e)
            return HashEmbedder(cfg.embed_dim)
    raise ValueError(f"unknown embedder {name!r}")
