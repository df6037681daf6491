"""Ingest->embed overlap with a TPU-bound encoder (round-4 VERDICT #8).

The reference hides download+filter behind the GPU embed via
`curl | mbuffer -m 4G | gunzip | oa_jsonl | build -b 32`
(/root/reference/Makefile:62-65). Our `ingest_partition` claims the
same property (producer thread + bounded prefetch) and accounts for it
(input-stall seconds, ingest/sync.py:149-169) — but the e2e sync bench
drives it with the ~free hash embedder, where "overlap" is trivial.

This runner ingests ONE synthetic partition through the REAL pipeline
(file:// part files -> gunzip -> native C++ filter -> batch-32 embed ->
sqlite upsert) with the full stella_en_1.5B_v5 ARCHITECTURE (random
device-init weights — throughput is weight-agnostic; the tokenizer is
the whitespace stand-in since the real one needs a HF cache) and
reports embed seconds vs input-stall seconds. stall/embed ~ 0 proves
the mbuffer-pipeline property holds when the embedder is TPU-bound.

    python benchmarks/ingest_overlap_bench.py --works 8192
"""

import argparse
import gzip
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _mk_partition(root: Path, n_works: int, n_parts: int = 4) -> list[str]:
    """Synthetic OpenAlex part files (gzip JSONL, abstract_inverted_index
    form — the native filter does real reconstruction work per record)."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    vocab = [f"term{i}" for i in range(5000)]
    urls = []
    per = n_works // n_parts
    for p in range(n_parts):
        lines = []
        for i in range(per):
            words = rng.choice(vocab, size=64)
            inv = {}
            for j, w in enumerate(words):
                inv.setdefault(str(w), []).append(int(j))
            lines.append(json.dumps({
                "id": f"https://openalex.org/W9{p:02d}{i:06d}",
                "title": f"Paper {i} of partition part {p}",
                "language": "en",
                "abstract_inverted_index": inv,
            }))
        f = root / f"part_{p:03d}.gz"
        f.write_bytes(gzip.compress(("\n".join(lines) + "\n").encode()))
        urls.append(f.as_uri())
    return urls


class _StellaArchEmbedder:
    """Full-size stella architecture, random weights, batch-32 forward
    through the production EmbeddingPipeline (bucketed, masked-mean,
    MRL head) — the `build -b 32` stage with a TPU-bound encoder."""

    def __init__(self, batch_size: int = 32, mrl_dim: int = 1024,
                 tiny: bool = False):
        import jax
        import jax.numpy as jnp

        from abstracts_search_tpu.models import (
            Qwen2Config, StellaConfig, StellaEncoder)
        from abstracts_search_tpu.models.embed import (
            EmbeddingPipeline, whitespace_tokenizer)

        if tiny:  # CPU smoke mode
            backbone = Qwen2Config.tiny(
                dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
            mrl_dim = 32
        else:
            backbone = Qwen2Config.stella_1_5b(
                dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        scfg = StellaConfig(backbone=backbone, mrl_dim=mrl_dim)
        model = StellaEncoder(scfg)
        ids = jnp.zeros((1, 8), jnp.int32)
        mask = jnp.ones((1, 8), jnp.int32)
        t0 = time.time()
        params = jax.jit(model.init)(jax.random.key(0), ids, mask)
        jax.block_until_ready(params)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree.leaves(params))
        print(f"[overlap] encoder init: {time.time() - t0:.1f}s, "
              f"{n_params / 1e9:.2f}B params", flush=True)
        self.pipeline = EmbeddingPipeline(
            scfg, params, whitespace_tokenizer(backbone.vocab_size),
            batch_size=batch_size)
        self.dim = mrl_dim

    def __call__(self, texts):
        return self.pipeline(texts)


def main() -> int:
    from abstracts_search_tpu.utils.watchdog import Watchdog

    _wd = Watchdog.for_benchmark("ingest_overlap_bench")
    ap = argparse.ArgumentParser()
    ap.add_argument("--works", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=32)   # BUILDFLAGS -b 32
    ap.add_argument("--tiny", action="store_true",
                    help="tiny backbone (CPU smoke test)")
    args = ap.parse_args()

    from abstracts_search_tpu.ingest.sync import ingest_partition
    from abstracts_search_tpu.storage.sqlite_store import init_store

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        urls = _mk_partition(root / "snap", args.works)
        emb = _StellaArchEmbedder(batch_size=args.batch, tiny=args.tiny)
        # warm the bucketed forward shapes so the measured window is
        # steady-state, not compile time
        t0 = time.time()
        emb(["warm " * 16] * args.batch)
        print(f"[overlap] warmup compile: {time.time() - t0:.1f}s",
              flush=True)
        store = init_store(root / "data.sqlite")
        store.bump_rev()

        stats: dict = {}
        t0 = time.time()
        n = ingest_partition(urls, emb, store, batch_size=args.batch,
                             stats=stats)
        wall = time.time() - t0
        store.close()

    out = {"works": n, "batch": args.batch, "wall_s": round(wall, 1),
           "docs_per_s": round(n / wall, 1),
           "embed_s": round(stats["embed_s"], 1),
           "stall_s": round(stats["stall_s"], 2),
           "stall_frac": round(stats["stall_s"] / max(wall, 1e-9), 4)}
    print("[overlap] RESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
