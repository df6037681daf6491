"""abstracts_search_tpu — a TPU-native semantic-search index framework.

Re-implements the full capability surface of colonelwatch/abstracts-search
(reference: /root/reference/README.md:5-12 — orchestration Makefile +
oa_jsonl filter, sidecar-search build tools, stella encoder, faiss index,
serving app) as a single TPU-first framework:

- ``ingest``   — OpenAlex works JSONL streaming filter (C++ hot path) +
                 manifest-diff incremental sync (reference Makefile:57-96).
- ``storage``  — SQLite embedding store + parquet shard dump/recover
                 (reference `sidecar-search init/build/dump`, Makefile:46-49).
- ``models``   — stella_en_1.5B_v5 (Qwen2-based) encoder in flax, batched
                 pjit forward over a TPU mesh (replaces torch/CUDA embed).
- ``ops``      — Pallas TPU kernels: fused scored top-k scan, k-means
                 assignment, PQ encode, ADC lookup-table scan.
- ``parallel`` — mesh construction, shard-parallel search, all-gather
                 top-k merge over ICI.
- ``index``    — Flat / IVF-Flat / OPQ+IVF-PQ indexes: distributed k-means
                 training, codebook training, fill, autotune (replaces the
                 faiss train/tune/fill stages, reference Makefile:11-39).
- ``serve``    — query encode + shard-parallel scan + OpenAlex hydration
                 (replaces the abstracts-index HF Space app).
- ``cli``      — `astpu` CLI with `init/build/dump/index train|tune|fill|
                 clean` parity plus the Makefile-equivalent driver targets
                 (`all/fill/tune/train/dump/build/recover/clean/sync`).
"""

__version__ = "0.1.0"
