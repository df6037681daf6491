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

import jax
import jax.numpy as jnp
import numpy as np

from .pq import ProductQuantizer

logger = logging.getLogger(__name__)

_CHUNK = 1 << 18


@jax.jit
def _rotate_chunk(x, r):
    return jnp.dot(x, r, preferred_element_type=jnp.float32)


@jax.jit
def _gram_chunk(x, xhat):
    return jnp.dot(x.T, xhat, preferred_element_type=jnp.float32)


def _rotate(x: np.ndarray, r: np.ndarray) -> np.ndarray:
    """x @ R on device, chunked (a 10M x 1024 host matmul on one CPU
    core would take hours; on the MXU it's seconds)."""
    out = np.empty_like(x)
    rj = jnp.asarray(r)
    for lo in range(0, len(x), _CHUNK):
        out[lo : lo + _CHUNK] = np.asarray(_rotate_chunk(jnp.asarray(x[lo : lo + _CHUNK]), rj))
    return out


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
            xr = _rotate(x, self.rotation)
            self.pq.train(xr, iters=pq_iters)
            # accumulate the Procrustes gram x^T xhat and the MSE chunked —
            # xhat for the full sample would be another full-size array
            gram = np.zeros((self.dim, self.dim), np.float64)
            sq_err = 0.0
            for lo in range(0, len(x), _CHUNK):
                xr_c = xr[lo : lo + _CHUNK]
                xhat_c = self.pq.decode(self.pq.encode(xr_c))
                sq_err += float(np.sum(np.square(xr_c - xhat_c)))
                gram += np.asarray(
                    _gram_chunk(jnp.asarray(x[lo : lo + _CHUNK]), jnp.asarray(xhat_c)),
                    np.float64,
                )
            mse = sq_err / x.size
            mses.append(mse)
            logger.info("opq iter %d: mse=%.6g", it, mse)
            if it == outer_iters - 1:
                break
            # Procrustes: R <- argmin_{R orthogonal} ||x R - xhat||
            u, _, vt = np.linalg.svd(gram, full_matrices=False)
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
