"""HTTP serving with the REAL (stella-architecture) query encoder.

`http_serve_bench.py` measured the serving stack at 207M with the ~free
hash embedder and found raw thread concurrency BEATS micro-batching
there (281 vs 164 QPS) — the batcher's claimed value case ("a stella
forward per request ... folding amortizes it") was asserted from the
encoder's standalone throughput, never measured end-to-end. This runner
measures it: the full stella_en_1.5B_v5 ARCHITECTURE (random
device-init weights — throughput is weight-agnostic; whitespace
tokenizer stand-in, as in ingest_overlap_bench.py) encodes every query,
over a small in-process IVF-PQ index (the scan is deliberately cheap so
the encoder dominates, which is exactly the production regime the
batcher exists for — reference serving contract
/root/reference/README.md:28 runs one encoder forward per request).

Also A/Bs the pow-2 encoder batch buckets (models/embed.py
``batch_buckets``): a qn=1 interactive encode dispatches a 1-row
forward instead of a full 32-row one.

    python benchmarks/http_encoder_bench.py --clients 32 --seconds 20
"""

import argparse
import json
import socket
import sys
import threading
import time
import urllib.parse
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _get(port: int, q: str, k: int = 10) -> dict:
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/search?q={urllib.parse.quote(q)}&k={k}",
            timeout=600) as r:
        return json.loads(r.read())


class _StellaArchEmbedder:
    """Full-size stella architecture, random weights, with the serving
    `queries` interface (s2p_query prompt path)."""

    def __init__(self, batch_size: int = 32, mrl_dim: int = 1024,
                 batch_buckets: bool = True, tiny: bool = False):
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
        print(f"[httpenc] encoder init: {time.time() - t0:.1f}s",
              flush=True)
        self.pipeline = EmbeddingPipeline(
            scfg, params, whitespace_tokenizer(backbone.vocab_size),
            batch_size=batch_size, batch_buckets=batch_buckets)
        self.dim = mrl_dim

    def __call__(self, texts):
        return self.pipeline(texts)

    def queries(self, texts):
        return self.pipeline.embed_queries(texts)


def main() -> int:
    from abstracts_search_tpu.utils.watchdog import Watchdog

    _wd = Watchdog.for_benchmark("http_encoder_bench")
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--lists", type=int, default=256)
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny backbone + tiny corpus (CPU smoke test)")
    args = ap.parse_args()

    from http.server import ThreadingHTTPServer

    from abstracts_search_tpu.index.ivfpq import IVFPQIndex
    from abstracts_search_tpu.serve.app import make_handler
    from abstracts_search_tpu.serve.batcher import MicroBatcher
    from abstracts_search_tpu.serve.engine import SearchEngine

    if args.tiny:
        args.n, args.lists = 4096, 16

    emb = _StellaArchEmbedder(batch_buckets=True, tiny=args.tiny)
    dim = emb.dim

    # small index: the scan must be cheap so the encoder dominates
    rng = np.random.default_rng(0)
    t0 = time.time()
    vecs = rng.standard_normal((args.n, dim), dtype=np.float32)
    index = IVFPQIndex(args.lists, dim, pq_m=dim // 8, pq_nbits=4,
                       use_opq=False)
    index.train(vecs[: max(args.lists * 64, 8192)],
                kmeans_iters=4, pq_iters=4)
    index.fill(vecs)
    print(f"[httpenc] index built in {time.time() - t0:.0f}s "
          f"(n={args.n:,}, lists={args.lists})", flush=True)

    ids = [f"W{i}" for i in range(args.n)]
    engine = SearchEngine(index, ids, emb, nprobe=8)

    out = {"n": args.n, "clients": args.clients,
           "encoder": "tiny" if args.tiny else "stella_1.5b_arch"}

    # warm every encoder batch bucket (1..32) and the matching scan
    # shapes — each 1.5B compile is ~1 min through the tunnel and must
    # not land inside the measured window
    t0 = time.time()
    for b in (1, 2, 4, 8, 16, 32, 64):
        for t in range(6):
            engine.search_batch(
                [f"warm shape {b} try {t} q{i}" for i in range(b)], k=args.k)
            st = getattr(engine.index, "last_scan_stats", {})
            if st.get("fused") and st.get("spec") == "hit":
                break
        print(f"[httpenc] shape {b} warm at {time.time() - t0:.0f}s",
              flush=True)
    out["shape_warmup_s"] = round(time.time() - t0, 1)

    # qn=1 interactive latency: pow-2 batch bucket (1-row forward) vs
    # the fixed-batch mode (32-row forward) on the SAME params
    lat = []
    for i in range(30):
        t0 = time.time()
        engine.search_batch([f"interactive probe {i}"], k=args.k)
        lat.append((time.time() - t0) * 1e3)
    out["qn1_bucketed_ms_p50"] = round(float(np.median(lat)), 1)
    emb.pipeline.batch_buckets = False
    engine.search_batch(["fixed warm"], k=args.k)  # 32-row shape compile
    lat = []
    for i in range(30):
        t0 = time.time()
        engine.search_batch([f"interactive fixed {i}"], k=args.k)
        lat.append((time.time() - t0) * 1e3)
    out["qn1_fixed32_ms_p50"] = round(float(np.median(lat)), 1)
    emb.pipeline.batch_buckets = True
    print(f"[httpenc] qn=1 p50: bucketed {out['qn1_bucketed_ms_p50']} ms "
          f"vs fixed-32 {out['qn1_fixed32_ms_p50']} ms", flush=True)

    for label, micro, workers in (("micro_batch", True, 4),
                                  ("no_batch", False, 0)):
        batcher = (MicroBatcher(engine, workers=workers, max_batch=32)
                   if micro else None)
        server = ThreadingHTTPServer(
            ("127.0.0.1", _free_port()), make_handler(engine, batcher))
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            lat = []
            for i in range(10):
                t0 = time.time()
                _get(port, f"warm single {label} {i}")
                lat.append((time.time() - t0) * 1e3)
            out[f"{label}_single_ms_p50"] = round(float(np.median(lat)), 1)

            stop = time.time() + args.seconds
            counts = [0] * args.clients
            lats: list[float] = []
            lat_lock = threading.Lock()
            errs = []

            def client(ci):
                r = np.random.default_rng(ci)
                try:
                    while time.time() < stop:
                        t0 = time.time()
                        _get(port, f"client {ci} q {r.integers(1e9)}", args.k)
                        dt = (time.time() - t0) * 1e3
                        counts[ci] += 1
                        with lat_lock:
                            lats.append(dt)
                except Exception as e:  # noqa: BLE001
                    errs.append(repr(e))

            ts = [threading.Thread(target=client, args=(ci,))
                  for ci in range(args.clients)]
            t0 = time.time()
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            wall = time.time() - t0
            assert not errs, errs[:3]
            out[f"{label}_concurrent_qps"] = round(sum(counts) / wall, 1)
            out[f"{label}_concurrent_ms_p50"] = round(
                float(np.median(lats)), 1)
            out[f"{label}_requests"] = int(sum(counts))
            if batcher is not None:
                out[f"{label}_stats"] = dict(batcher.stats)
            print(f"[httpenc] {label}: single p50 "
                  f"{out[f'{label}_single_ms_p50']} ms, {args.clients}-client "
                  f"QPS {out[f'{label}_concurrent_qps']} "
                  f"(p50 {out[f'{label}_concurrent_ms_p50']} ms)", flush=True)
        finally:
            if batcher is not None:
                batcher.close()
            server.shutdown()
            server.server_close()

    Path("/tmp/http_encoder_report.json").write_text(json.dumps(out, indent=2))
    print("[httpenc] RESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
