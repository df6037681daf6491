"""Product quantizer: per-subspace codebooks, trained on the mesh.

Replaces faiss PQ training + encoding behind `index train` / `index
fill` (SURVEY.md §2 #7,#9). The vector space is split into M subspaces
of dsub dims; each gets a ksub=2^nbits-centroid codebook; a vector is
stored as M uint8 codes (M=64, nbits=8 -> 64 B/vector at 1024 dims, the
usual budget for this corpus class).

All M subspace k-means run as ONE batched Lloyd iteration on the mesh:
rows sharded over ``shard``, scores via a single einsum
[n,M,dsub]x[M,ksub,dsub] on the MXU, assignment by argmin L2 (expanded
as ||c||^2 - 2 x.c so it is matmul-shaped), centroid sums via one-hot
einsum, `psum` over ICI. Encode reuses the same assignment computation.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..parallel.mesh import SHARD_AXIS, build_mesh

logger = logging.getLogger(__name__)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class ProductQuantizer:
    def __init__(
        self,
        dim: int,
        m: int = 64,
        nbits: int = 8,
        *,
        mesh=None,
        seed: int = 0,
    ):
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by M {m}")
        if nbits > 8:
            raise ValueError("nbits > 8 not supported (codes are uint8)")
        self.dim = dim
        self.m = m
        self.nbits = nbits
        self.ksub = 1 << nbits
        self.dsub = dim // m
        self.mesh = mesh if mesh is not None else build_mesh()
        self.seed = seed
        self.centroids: np.ndarray | None = None  # [M, ksub, dsub]
        self.stats: dict = {}
        self._fns: dict = {}

    @property
    def ndev(self) -> int:
        return self.mesh.shape[SHARD_AXIS]

    @property
    def is_trained(self) -> bool:
        return self.centroids is not None

    # -- jitted SPMD pieces ------------------------------------------------------

    def _assign_local(self, x, c):
        """x: [n, M, dsub], c: [M, ksub, dsub] -> codes [n, M] int32."""
        # argmin ||x - c||^2 == argmin ||c||^2 - 2 x.c  (matmul-shaped)
        dots = jnp.einsum(
            "nmd,mkd->nmk", x, c, preferred_element_type=jnp.float32
        )
        c2 = jnp.sum(jnp.square(c.astype(jnp.float32)), axis=-1)  # [M, ksub]
        return jnp.argmin(c2[None] - 2.0 * dots, axis=-1).astype(jnp.int32)

    def _build_train_step(self):
        m, ksub, dsub = self.m, self.ksub, self.dsub

        def local(x, valid, c):
            codes = self._assign_local(x, c)                     # [n, M]
            v3 = valid[:, :, None]                               # [n, 1, 1]
            onehot = jax.nn.one_hot(codes, ksub, dtype=jnp.float32) * v3  # [n, M, ksub]
            sums = jnp.einsum(
                "nmk,nmd->mkd", onehot, x.astype(jnp.float32) * v3,
                preferred_element_type=jnp.float32,
            )
            counts = jnp.sum(onehot, axis=0)                     # [M, ksub]
            # reconstruction error contribution (for stats)
            rec = jnp.einsum("nmk,mkd->nmd", onehot, c)
            err = jnp.sum(jnp.square((x - rec) * v3))
            return (
                lax.psum(sums, SHARD_AXIS),
                lax.psum(counts, SHARD_AXIS),
                lax.psum(err, SHARD_AXIS),
            )

        fn = shard_map(
            local, mesh=self.mesh,
            in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def _build_encode(self):
        def local(x, c):
            return self._assign_local(x, c)

        fn = shard_map(
            local, mesh=self.mesh,
            in_specs=(P(SHARD_AXIS), P()),
            out_specs=P(SHARD_AXIS),
            check_vma=False,
        )
        return jax.jit(fn)

    # -- data plumbing --------------------------------------------------------------

    def _pad_rows(self, x: np.ndarray):
        n = x.shape[0]
        per = _round_up(_round_up(n, self.ndev) // self.ndev, 8)
        total = per * self.ndev
        if total != n:
            x = np.concatenate([x, np.zeros((total - n,) + x.shape[1:], x.dtype)])
        valid = np.zeros((total, 1), np.float32)
        valid[:n] = 1.0
        return x, valid

    def _subspaced(self, x: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(
            np.asarray(x, np.float32).reshape(len(x), self.m, self.dsub)
        )

    # -- API ---------------------------------------------------------------------------

    def train(self, x: np.ndarray, *, iters: int = 12, tol: float = 1e-5,
              batch_rows: int = 1 << 18) -> np.ndarray:
        x = self._subspaced(x)
        n = len(x)
        if n < self.ksub:
            raise ValueError(f"need >= ksub={self.ksub} rows, got {n}")

        # stage padded batches on device when they fit (same rationale as
        # KMeans.fit: don't re-upload the sample every Lloyd iteration)
        from ..parallel.mesh import global_put

        on_device = x.nbytes <= (4 << 30) * self.ndev
        staged = []
        for lo in range(0, n, batch_rows):
            xp, valid = self._pad_rows(x[lo : lo + batch_rows])
            if on_device:
                xp = global_put(xp, self.mesh, P(SHARD_AXIS))
                valid = global_put(valid, self.mesh, P(SHARD_AXIS))
            staged.append((xp, valid))

        def fetch_rows(idx: np.ndarray) -> np.ndarray:
            return x[idx]

        return self._lloyd(staged, n, fetch_rows, iters=iters, tol=tol)

    def train_staged(self, xj3, valid, n: int, *, iters: int = 12,
                     tol: float = 1e-5) -> np.ndarray:
        """Train on an ALREADY device-resident sample — `xj3` is a padded
        [total, M, dsub] array row-sharded over the mesh, `valid` its
        [total, 1] f32 mask. Nothing sample-sized crosses host<->device:
        only per-iteration [M, ksub, dsub] sums + the few rows needed for
        init / empty-code reseeds come back. This is the OPQ inner loop's
        path (opq.py): the alternation re-trains the PQ every outer
        iteration and the sample upload must not be paid each time."""
        if n < self.ksub:
            raise ValueError(f"need >= ksub={self.ksub} rows, got {n}")

        def fetch_rows(idx: np.ndarray) -> np.ndarray:
            # gather on device, download only the requested rows
            return np.asarray(jnp.take(xj3, jnp.asarray(np.sort(idx)), axis=0))

        return self._lloyd([(xj3, valid)], n, fetch_rows, iters=iters, tol=tol)

    def _lloyd(self, staged, n, fetch_rows, *, iters, tol) -> np.ndarray:
        """Shared batched-subspace Lloyd loop over staged (x, valid)
        batches; `fetch_rows(idx) -> [len(idx), M, dsub]` supplies
        training rows for init and empty-code reseeding."""
        rng = np.random.default_rng(self.seed)
        init = rng.choice(n, size=self.ksub, replace=False)
        c = np.transpose(
            np.asarray(fetch_rows(np.sort(init)), np.float32), (1, 0, 2)
        ).copy()  # [M, ksub, dsub]

        step = self._build_train_step()

        errs = []
        prev = None
        for it in range(iters):
            cj = jnp.asarray(c)
            sums = np.zeros((self.m, self.ksub, self.dsub), np.float64)
            counts = np.zeros((self.m, self.ksub), np.float64)
            err = 0.0
            for xp, valid in staged:
                s, cnt, e = step(jnp.asarray(xp), jnp.asarray(valid), cj)
                sums += np.asarray(s, np.float64)
                counts += np.asarray(cnt, np.float64)
                err += float(e)
            mse = err / (n * self.dim)
            errs.append(mse)

            newc = np.where(
                counts[..., None] > 0, sums / np.maximum(counts[..., None], 1), c
            ).astype(np.float32)
            # empty codes: reseed from random training rows (per subspace)
            empties = {mi: np.flatnonzero(counts[mi] == 0) for mi in range(self.m)}
            n_empty = sum(len(v) for v in empties.values())
            if n_empty:
                seeds = np.asarray(
                    fetch_rows(rng.integers(0, n, n_empty)), np.float32)
                off = 0
                for mi, empty in empties.items():
                    if len(empty):
                        newc[mi, empty] = seeds[off : off + len(empty), mi]
                        off += len(empty)
            c = newc
            logger.info("pq train iter %d: mse=%.6g", it, mse)
            if prev is not None and abs(prev - mse) < tol * max(prev, 1e-12):
                break
            prev = mse

        self.centroids = c
        self.stats = {"m": self.m, "ksub": self.ksub, "n_train": n, "mse": errs}
        return c

    def encode(self, x: np.ndarray, *, batch_rows: int = 1 << 18) -> np.ndarray:
        """x [N, dim] -> codes [N, M] uint8 (chunked through the device)."""
        if not self.is_trained:
            raise RuntimeError("train() first")
        xs = self._subspaced(x)
        n = len(xs)
        cj = jnp.asarray(self.centroids)
        out = np.empty((n, self.m), np.uint8)
        if "encode" not in self._fns:
            self._fns["encode"] = self._build_encode()
        for lo in range(0, n, batch_rows):
            xp, _ = self._pad_rows(xs[lo : lo + batch_rows])
            codes = np.asarray(self._fns["encode"](jnp.asarray(xp), cj))
            take = min(batch_rows, n - lo)
            out[lo : lo + take] = codes[:take].astype(np.uint8)
        return out

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """codes [N, M] (or nibble-packed [N, M/2] — the 4-bit storage
        format: byte j = subspace 2j low nibble, 2j+1 high) -> approx
        vectors [N, dim]."""
        codes = np.asarray(codes)
        if self.nbits == 4 and codes.shape[-1] == self.m // 2:
            codes = np.stack([codes & 0xF, codes >> 4], axis=-1
                             ).reshape(len(codes), self.m)
        c = self.centroids  # [M, ksub, dsub]
        out = c[np.arange(self.m)[None, :], codes.astype(np.int64)]  # [N, M, dsub]
        return out.reshape(len(codes), self.dim)

    def reconstruction_mse(self, x: np.ndarray) -> float:
        return float(np.mean(np.square(x - self.decode(self.encode(x)))))
