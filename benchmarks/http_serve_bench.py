"""End-to-end HTTP serving benchmark at the production artifacts.

Round-3 VERDICT next #4: the 1,728 QPS/chip figure is the engine-level
batch loop; this runner measures `astpu serve`'s ACTUAL HTTP surface over
the same artifacts — ThreadingHTTPServer + micro-batcher + IdMap +
hydration off — under concurrent closed-loop clients:

  1. GET /search single-query latency (cold IdMap + warm), with and
     without micro-batching,
  2. concurrent GET load (N client threads),
  3. POST /search batch throughput.

The embedder is `hash` (host-side, ~0 cost) so the measurement isolates
the serving stack + index path; a stella query encoder adds its own
documented ~4 ms/query/chip at batch 32 (benchmarks/RESULTS.md encoder
section).

    python benchmarks/http_serve_bench.py --root /tmp/astpu_prod207m \
        --clients 32 --seconds 20
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


def main() -> int:
    from abstracts_search_tpu.utils.watchdog import Watchdog

    _wd = Watchdog.for_benchmark("http_serve_bench")
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/astpu_prod207m")
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from abstracts_search_tpu.config import Config
    from abstracts_search_tpu.serve.app import make_handler
    from abstracts_search_tpu.serve.batcher import MicroBatcher
    from abstracts_search_tpu.serve.engine import SearchEngine

    from http.server import ThreadingHTTPServer

    root = Path(args.root)
    cfg = Config(
        data_dir=str(root / "data"), index_dir=str(root / "index"),
        store_path=str(root / "data.sqlite"), events_dir=str(root / "events"),
        index_storage="auto", model_name="hash-test",
    )
    t0 = time.time()
    engine = SearchEngine.from_artifacts(
        cfg, index_dir=cfg.index_dir, embedder="hash", hydrate=False)
    t_start = time.time() - t0
    print(f"[http] engine up in {t_start:.0f} s "
          f"(n={engine.index.n:,}, nprobe={engine.nprobe}, "
          f"storage={engine.index.storage}, "
          f"idmap_sidecar={getattr(engine.ids, 'uses_sidecar', False)})",
          flush=True)

    out = {"n": engine.index.n, "nprobe": engine.nprobe,
           "storage": engine.index.storage, "startup_s": round(t_start, 1),
           "clients": args.clients}

    # pre-compile every program shape this run will hit (the pow-2
    # micro-batch buckets up to max_batch, plus the POST bulk batch):
    # at 207M each first compile is minutes through the tunnel and
    # would otherwise land inside — and dominate — the measured window
    # ... and each shape must settle into the fused steady state: call 1
    # is the cold 2-dispatch path that RECORDS the speculative scan
    # shape, call 2 compiles the fused program at that shape, and a spec
    # GROWTH (a batch needing more slots than any earlier one) compiles
    # again — so drive each shape with fresh random queries until the
    # scan reports a fused spec hit (bounded at 8 tries).
    t0 = time.time()
    for b in (1, 2, 4, 8, 16, 32, 64, 256):
        for t in range(8):
            engine.search_batch(
                [f"warm shape {b} try {t} q{i}" for i in range(b)], k=args.k)
            st = getattr(engine.index, "last_scan_stats", {})
            if st.get("fused") and st.get("spec") == "hit":
                break
        print(f"[http] shape {b} warm at {time.time() - t0:.0f} s "
              f"({t + 1} tries, {st.get('spec')}/fused={st.get('fused')})",
              flush=True)
    out["shape_warmup_s"] = round(time.time() - t0, 1)

    # engine-level qn=1 interactive latency (no HTTP layer): the fused
    # single-dispatch path at the production geometry (VERDICT r4 #5 —
    # the 33.7 ms one-RTT figure was measured at 8.4M)
    lat = []
    for i in range(30):
        t0 = time.time()
        engine.search_batch([f"interactive probe {i}"], k=args.k)
        lat.append((time.time() - t0) * 1e3)
    out["engine_qn1_ms_p50"] = round(float(np.median(lat)), 1)
    out["engine_qn1_ms_p90"] = round(float(np.percentile(lat, 90)), 1)
    print(f"[http] engine qn=1: p50 {out['engine_qn1_ms_p50']} ms, "
          f"p90 {out['engine_qn1_ms_p90']} ms", flush=True)

    # micro_batch = the default 4-worker pipelined batcher;
    # micro_batch_w1 = the round-4 single-worker behavior (batches
    # serialized -> dead RTT per batch), kept as the A/B baseline
    for label, micro, workers in (("micro_batch", True, 4),
                                  ("micro_batch_w1", True, 1),
                                  ("no_batch", False, 0)):
        batcher = MicroBatcher(engine, workers=workers) if micro else None
        server = ThreadingHTTPServer(
            ("127.0.0.1", _free_port()), make_handler(engine, batcher))
        port = server.server_address[1]
        th = threading.Thread(target=server.serve_forever, daemon=True)
        th.start()
        try:
            # cold single query (first HTTP hit: IdMap cold groups)
            t0 = time.time()
            r = _get(port, "probe query cold")
            cold_ms = (time.time() - t0) * 1e3
            assert r["results"], r
            # warm single-query latency
            lat = []
            for i in range(20):
                t0 = time.time()
                _get(port, f"warm probe {i}")
                lat.append((time.time() - t0) * 1e3)
            out[f"{label}_single_ms_p50"] = round(float(np.median(lat)), 1)
            out[f"{label}_single_ms_cold"] = round(cold_ms, 1)

            # concurrent closed-loop clients
            stop = time.time() + args.seconds
            counts = [0] * args.clients
            errs = []

            def client(ci):
                r = np.random.default_rng(ci)
                try:
                    while time.time() < stop:
                        _get(port, f"client {ci} q {r.integers(1e9)}", args.k)
                        counts[ci] += 1
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
            qps = sum(counts) / wall
            out[f"{label}_concurrent_qps"] = round(qps, 1)
            out[f"{label}_requests"] = int(sum(counts))
            if micro and batcher is not None:
                out[f"{label}_stats"] = dict(batcher.stats)
            print(f"[http] {label}: cold {cold_ms:.0f} ms, warm p50 "
                  f"{np.median(lat):.0f} ms, {args.clients}-client QPS "
                  f"{qps:.1f}", flush=True)
        finally:
            if batcher is not None:
                batcher.close()
            server.shutdown()
            server.server_close()

    # POST batch throughput (the bulk API)
    server = ThreadingHTTPServer(
        ("127.0.0.1", _free_port()), make_handler(engine, None))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        payload = json.dumps({
            "queries": [f"bulk {i}" for i in range(256)], "k": args.k,
        }).encode()

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search", data=payload,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.loads(r.read())

        post()                                   # warm
        reps, t0 = 5, time.time()
        for _ in range(reps):
            r = post()
        dt = (time.time() - t0) / reps
        assert len(r["results"]) == 256
        out["post_batch256_qps"] = round(256 / dt, 1)
        print(f"[http] POST batch-256: {256 / dt:.0f} QPS "
              f"({dt * 1e3:.0f} ms/batch)", flush=True)
    finally:
        server.shutdown()
        server.server_close()

    (root / "http_serve_report.json").write_text(json.dumps(out, indent=2))
    print("[http] RESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
