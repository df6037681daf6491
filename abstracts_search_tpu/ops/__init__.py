"""Pallas TPU kernels and their XLA reference implementations.

Every kernel here replaces a faiss C++ hot loop (SURVEY.md §2 #11):
- ``topk``          — fused matmul + streaming top-k scan (flat search /
                      IVF list scan; replaces the faiss top-k heap).
- ``kmeans_assign`` — tiled distance matmul + running argmax (replaces
                      faiss `Clustering` assignment).
- ``adc``           — PQ lookup-table accumulation (replaces the faiss
                      IndexIVFPQ ADC scan).

Each op has an ``impl`` switch: ``"pallas"`` (TPU hot path),
``"xla"`` (pure-XLA reference, also the CPU-mesh test path), ``"auto"``.
"""

from .topk import streaming_topk

__all__ = ["streaming_topk"]
