"""Vector indexes: Flat (exact), IVF-Flat, OPQ+IVF-PQ.

The TPU-native replacement for the faiss machinery behind the reference's
`sidecar-search index train/tune/fill` stages (SURVEY.md §1 L3, §2 #7-11;
reference Makefile:11-13,23-39). Exact flat search doubles as the recall
ground-truth oracle for every quantized index (SURVEY.md §7 step 2).
"""

from .flat import FlatIndex
from .ivf import IVFFlatIndex
from .ivfpq import IVFPQIndex
from .kmeans import KMeans
from .opq import OPQ
from .pq import ProductQuantizer

__all__ = ["FlatIndex", "IVFFlatIndex", "IVFPQIndex", "KMeans", "OPQ", "ProductQuantizer"]
