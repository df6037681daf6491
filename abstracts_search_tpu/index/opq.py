"""OPQ: learned rotation that minimizes PQ reconstruction error.

The faiss `OPQMatrix` analog in the reference's index chain (SURVEY.md
§2 #7: "OPQ (alternating rotation/PQ) ... as JAX ops"; BASELINE.md
config 4 is an OPQ+IVF-PQ build). Classic alternating optimization:

  repeat:
    1. train/encode a PQ on the rotated data  x @ R
    2. update R by orthogonal Procrustes: minimize ||x R - x_hat||_F
       over orthogonal R, where x_hat = decode(encode(x R)).
       Solution: R = U V^T from SVD(x^T x_hat).

The SVD is D x D (1024^2) — host numpy; the heavy parts (PQ Lloyd
iterations, encode) run on the mesh via ProductQuantizer.
"""

from __future__ import annotations

import logging

import numpy as np

from .pq import ProductQuantizer

logger = logging.getLogger(__name__)


class OPQ:
    def __init__(self, dim: int, m: int = 64, nbits: int = 8, *, mesh=None, seed: int = 0):
        self.dim = dim
        self.pq = ProductQuantizer(dim, m, nbits, mesh=mesh, seed=seed)
        self.rotation = np.eye(dim, dtype=np.float32)  # R: applied as x @ R
        self.stats: dict = {}

    def train(
        self,
        x: np.ndarray,
        *,
        outer_iters: int = 4,
        pq_iters: int = 8,
        init: str = "identity",
        seed: int = 0,
    ) -> np.ndarray:
        """Alternate PQ training and Procrustes rotation updates."""
        x = np.asarray(x, np.float32)
        if init == "random":
            rng = np.random.default_rng(seed)
            q, _ = np.linalg.qr(rng.standard_normal((self.dim, self.dim)))
            self.rotation = q.astype(np.float32)

        mses = []
        for it in range(outer_iters):
            xr = x @ self.rotation
            self.pq.train(xr, iters=pq_iters)
            xhat = self.pq.decode(self.pq.encode(xr))
            mse = float(np.mean(np.square(xr - xhat)))
            mses.append(mse)
            logger.info("opq iter %d: mse=%.6g", it, mse)
            if it == outer_iters - 1:
                break
            # Procrustes: R <- argmin_{R orthogonal} ||x R - xhat||
            u, _, vt = np.linalg.svd(x.T @ xhat, full_matrices=False)
            self.rotation = (u @ vt).astype(np.float32)

        self.stats = {"mse": mses, "m": self.pq.m, "nbits": self.pq.nbits}
        return self.rotation

    def apply(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(x, np.float32) @ self.rotation

    def encode(self, x: np.ndarray) -> np.ndarray:
        return self.pq.encode(self.apply(x))

    def decode_unrotated(self, codes: np.ndarray) -> np.ndarray:
        """Decode back into the ORIGINAL (unrotated) space."""
        return self.pq.decode(codes) @ self.rotation.T
