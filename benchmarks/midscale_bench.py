"""500k operating-point bench: PQ128x4-packed vs PQ64x8 at equal memory.

The README table's mid-scale row (one chip, true end-to-end timing,
nothing subtracted). Measures the config tradeoff the ADC formulation
creates on TPU: ksub is the arithmetic-amplification knob, so 4-bit
codes are ~3x faster at the same 64 B/vector (DESIGN.md §3). Corpus is
generated on device (the tunnel moves ~22 MiB/s; never ship 2 GB).
Recall on this no-OPQ isotropic corpus is PQ-distortion-limited — use
clustered_bench.py / the 207M oracle runs for meaningful recall.

Run: python benchmarks/midscale_bench.py  (real chip; ~15 min)
"""
import sys, time
sys.path.insert(0, "/root/repo")
from abstracts_search_tpu.utils.watchdog import Watchdog
_wd = Watchdog.for_benchmark("midscale_bench")  # wedge guard (VERDICT r3 #8)
import numpy as np
import jax, jax.numpy as jnp
from abstracts_search_tpu.index.ivfpq import IVFPQIndex
from abstracts_search_tpu.parallel import build_mesh

N, D, LISTS, NQ, K = 500_000, 1024, 1024, 128, 10
rng = np.random.default_rng(0)

# device-side corpus gen (tunnel: never ship 2 GB)
@jax.jit
def gen(key):
    x = jax.random.normal(key, (131072, D), jnp.float32)
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)

CH = 131072
chunks = []
for ci in range((N + CH - 1) // CH):
    n = min(CH, N - ci * CH)
    chunks.append(np.asarray(gen(jax.random.fold_in(jax.random.key(0), ci)))[:n])
x = np.concatenate(chunks)
q = x[rng.choice(N, NQ, replace=False)] + 0.05 * rng.standard_normal((NQ, D)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)

for pq_m, nbits, tag in ((128, 4, "128x4 packed"), (64, 8, "64x8")):
    idx = IVFPQIndex(LISTS, D, pq_m=pq_m, pq_nbits=nbits, use_opq=False,
                     mesh=build_mesh(), seg_size=512, chunk=2048, seed=0)
    t0 = time.time()
    idx.train(x[:200_000], kmeans_iters=6, pq_iters=6)
    idx.fill(x)
    print(f"{tag}: train+fill {time.time()-t0:.0f}s", flush=True)
    # exact oracle via flat
    from abstracts_search_tpu.index import FlatIndex
    flat = FlatIndex(idx.mesh, chunk=2048)
    flat.add(x)
    _, ref = flat.search(q, K)
    v, pos = idx.search(q, K, nprobe=32)
    recall = np.mean([len(set(pos[i]) & set(ref[i])) / K for i in range(NQ)])
    idx.search(q, K, nprobe=32)
    reps = 10; t0 = time.time()
    for _ in range(reps):
        idx.search(q, K, nprobe=32)
    dt = (time.time() - t0) / reps
    print(f"{tag}: nprobe=32/1024 1-recall@10={recall:.3f} "
          f"{NQ/dt:.0f} QPS/chip true e2e", flush=True)
print("DONE", flush=True)
