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
from jax import lax

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
        keep_staged: bool = False,
    ) -> np.ndarray:
        """Alternate PQ training and Procrustes rotation updates.

        The sample is staged on the mesh ONCE; every step of the
        alternation — rotate, PQ Lloyd, encode/decode, the Procrustes
        gram x^T xhat and the MSE — runs on device, and only the
        [D, D] gram (4 MB) plus scalars come back per outer iteration.
        (The chunked host formulation shipped the sample across the
        host<->device link ~7x per iteration; on the remote-tunnel
        deployment that made OPQ the dominant cost of the whole index
        train — ~25 min for a 262k-row sub-sample.) The host keeps the
        SVD: a [1024, 1024] factorization is 1-core-cheap next to any
        transfer."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import SHARD_AXIS, global_put

        x = np.asarray(x, np.float32)
        n, dim = x.shape
        m, dsub, ksub = self.pq.m, self.pq.dsub, self.pq.ksub
        if init == "random":
            rng = np.random.default_rng(seed)
            q, _ = np.linalg.qr(rng.standard_normal((self.dim, self.dim)))
            self.rotation = q.astype(np.float32)

        # stage once: padded rows sharded over the mesh
        ndev = self.pq.ndev
        per = ((n + ndev - 1) // ndev + 7) // 8 * 8
        total = per * ndev
        xp = x if total == n else np.concatenate(
            [x, np.zeros((total - n, dim), np.float32)])
        valid = np.zeros((total, 1), np.float32)
        valid[:n] = 1.0
        mesh = self.pq.mesh
        xj = global_put(xp, mesh, P(SHARD_AXIS))
        vj = global_put(valid, mesh, P(SHARD_AXIS))
        del xp

        rotate = jax.jit(shard_map(
            lambda xs, r: jnp.dot(xs, r, preferred_element_type=jnp.float32),
            mesh=mesh, in_specs=(P(SHARD_AXIS), P()), out_specs=P(SHARD_AXIS),
            check_vma=False,
        ))

        def local_gram(xs, xrs, vs, c):
            # encode xr -> decode -> gram(x, xhat) + sq err, all local
            xr3 = xrs.reshape(xrs.shape[0], m, dsub)
            dots = jnp.einsum("nmd,mkd->nmk", xr3, c,
                              preferred_element_type=jnp.float32)
            c2 = jnp.sum(jnp.square(c), axis=-1)                 # [M, ksub]
            codes = jnp.argmin(c2[None] - 2.0 * dots, axis=-1)   # [n, M]
            onehot = jax.nn.one_hot(codes, ksub, dtype=jnp.float32)
            xhat3 = jnp.einsum("nmk,mkd->nmd", onehot, c,
                               preferred_element_type=jnp.float32)
            xhat = xhat3.reshape(xrs.shape) * vs                 # zero pad rows
            gram = jnp.dot(xs.T, xhat, preferred_element_type=jnp.float32)
            err = jnp.sum(jnp.square((xrs - xhat3.reshape(xrs.shape)) * vs))
            return lax.psum(gram, SHARD_AXIS), lax.psum(err, SHARD_AXIS)

        gram_fn = jax.jit(shard_map(
            local_gram, mesh=mesh,
            in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P()),
            out_specs=(P(), P()), check_vma=False,
        ))

        mses = []
        for it in range(outer_iters):
            xr = rotate(xj, jnp.asarray(self.rotation))
            xr3 = xr.reshape(total, m, dsub)
            self.pq.train_staged(xr3, vj, n, iters=pq_iters)
            gram, sq_err = gram_fn(xj, xr, vj, jnp.asarray(self.pq.centroids))
            mse = float(sq_err) / (n * dim)
            mses.append(mse)
            logger.info("opq iter %d: mse=%.6g", it, mse)
            if it == outer_iters - 1:
                break
            # Procrustes: R <- argmin_{R orthogonal} ||x R - xhat||
            u, _, vt = np.linalg.svd(np.asarray(gram, np.float64),
                                     full_matrices=False)
            self.rotation = (u @ vt).astype(np.float32)

        self.stats = {"mse": mses, "m": self.pq.m, "nbits": self.pq.nbits}
        # with keep_staged the caller reuses the device-resident rows
        # (ivfpq residual-PQ training) and frees them via drop_staged()
        self._staged = (xj, vj, n) if keep_staged else None
        return self.rotation

    def staged(self):
        """(xj, valid, n) staged by train(keep_staged=True), or None."""
        return getattr(self, "_staged", None)

    def drop_staged(self) -> None:
        self._staged = None

    def apply(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(x, np.float32) @ self.rotation

    def encode(self, x: np.ndarray) -> np.ndarray:
        return self.pq.encode(self.apply(x))

    def decode_unrotated(self, codes: np.ndarray) -> np.ndarray:
        """Decode back into the ORIGINAL (unrotated) space."""
        return self.pq.decode(codes) @ self.rotation.T
