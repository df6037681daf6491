"""Batched, bucketed embedding pipeline over a device mesh.

Replaces the reference's `sidecar-search build -b 32` GPU embed stage
(SURVEY.md §2 #4; reference Makefile:65, README.md:60) with a pjit
data-parallel JAX forward:

- texts are tokenized (tokenizer injected — any callable
  ``text -> list[int]``; production uses the HF Qwen2 tokenizer, tests a
  toy one),
- padded into a small set of sequence-length *buckets* so XLA compiles
  one program per (bucket, batch) shape instead of one per input length,
- batches are padded to a fixed batch size (or, with
  ``batch_buckets=True``, to the next power of two — the serving mode:
  a single interactive query then costs a 1-row forward, not a full
  ``batch_size``-row one), replicated-weight / batch-sharded over the
  mesh's ``shard`` axis, and run through StellaEncoder,
- query texts get the ``s2p_query`` prompt prefix; corpus documents are
  embedded bare (reference README.md:28,60 contract).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import SHARD_AXIS
from .stella import PROMPTS, StellaConfig, StellaEncoder

Tokenizer = Callable[[str], Sequence[int]]

DEFAULT_BUCKETS = (32, 64, 128, 256, 512)


class EmbeddingPipeline:
    """texts -> [n, mrl_dim] float32 embeddings."""

    def __init__(
        self,
        cfg: StellaConfig,
        params,
        tokenizer: Tokenizer,
        *,
        pad_id: int = 0,
        batch_size: int = 32,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        batch_buckets: bool = False,
        mesh=None,
        param_shardings=None,
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.pad_id = pad_id
        self.batch_size = batch_size
        self.buckets = tuple(sorted(buckets))
        self.batch_buckets = batch_buckets
        self.mesh = mesh
        self.model = StellaEncoder(cfg)
        if mesh is not None:
            data_sharding = NamedSharding(mesh, P(SHARD_AXIS))
            repl = NamedSharding(mesh, P())
            # weights: TP shardings when the caller restored them that
            # way (parallel/sharding.py), replicated otherwise; data is
            # batch-sharded over `shard` either way
            pshard = (param_shardings if param_shardings is not None
                      else jax.tree.map(lambda _: repl, params))
            from ..parallel.mesh import global_put_with_sharding

            self.params = jax.tree.map(global_put_with_sharding, params, pshard)
            self._apply = jax.jit(
                self.model.apply,
                in_shardings=(pshard, data_sharding, data_sharding),
                out_shardings=repl,
            )
        else:
            self.params = params
            self._apply = jax.jit(self.model.apply)

    # -- tokenization / bucketing --------------------------------------------

    def _bucket_for(self, length: int) -> int:
        for b in self.buckets:
            if length <= b:
                return b
        return self.buckets[-1]

    def _batch_pad(self, n: int) -> int:
        """Rows the dispatched forward carries for a chunk of ``n`` texts.

        Fixed ``batch_size`` by default (the bulk-build mode: every chunk
        but the tail is full anyway). With ``batch_buckets`` the chunk
        pads to the next power of two — at most ~2x padding, and a qn=1
        interactive encode runs a 1-row forward instead of a
        ``batch_size``-row one (a ~batch_size x FLOP cut on the serving
        path). A mesh batch-shards rows over its ``shard`` axis only, so
        the bucket is floored at THAT axis's extent for divisibility —
        not the whole device count: on a dp x tp mesh, flooring at
        mesh.size would pad a qn=1 encode by the tp factor for nothing
        (round-5 review finding)."""
        if not self.batch_buckets:
            return self.batch_size
        b = 1
        while b < n:
            b <<= 1
        if self.mesh is not None:
            b = max(b, self.mesh.shape[SHARD_AXIS])
        return min(b, self.batch_size)

    def _tokenize(self, texts: Sequence[str], prompt: str | None):
        prefix = PROMPTS[prompt] if prompt else ""
        toks = [list(self.tokenizer(prefix + t))[: self.buckets[-1]] for t in texts]
        return toks

    # -- embedding -------------------------------------------------------------

    def __call__(self, texts: Sequence[str], *, prompt: str | None = None) -> np.ndarray:
        if len(texts) == 0:
            return np.zeros((0, self.cfg.mrl_dim), np.float32)
        toks = self._tokenize(texts, prompt)

        # group indices by bucket to minimize padding waste
        order = sorted(range(len(toks)), key=lambda i: len(toks[i]))
        out = np.zeros((len(texts), self.cfg.mrl_dim), np.float32)

        pos = 0
        while pos < len(order):
            batch_idx = order[pos : pos + self.batch_size]
            pos += self.batch_size
            bucket = self._bucket_for(max(len(toks[i]) for i in batch_idx))

            bs = self._batch_pad(len(batch_idx))
            ids = np.full((bs, bucket), self.pad_id, np.int32)
            mask = np.zeros((bs, bucket), np.int32)
            for r, i in enumerate(batch_idx):
                t = toks[i]
                ids[r, : len(t)] = t
                mask[r, : len(t)] = 1
            # fully-padded rows break masked pooling denominators; give
            # them one live token (their output is discarded anyway)
            for r in range(len(batch_idx), bs):
                mask[r, 0] = 1

            emb = np.asarray(
                self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask))
            )
            out[batch_idx] = emb[: len(batch_idx)]
        return out

    def embed_queries(self, texts: Sequence[str], prompt: str = "s2p_query") -> np.ndarray:
        """Query-side embedding with the instruction prompt (README.md:28)."""
        return self(texts, prompt=prompt)


def whitespace_tokenizer(vocab_size: int = 30_000) -> Tokenizer:
    """Toy deterministic tokenizer for offline tests/demos."""

    def tok(text: str) -> list[int]:
        return [(hash(w) % (vocab_size - 2)) + 2 for w in text.split()] or [1]

    return tok


def load_hf_tokenizer(model_name: str):
    """Production tokenizer via transformers (requires local HF cache)."""
    from transformers import AutoTokenizer

    t = AutoTokenizer.from_pretrained(model_name)
    return lambda text: t(text, add_special_tokens=True)["input_ids"]
