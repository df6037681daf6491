"""Worker process for the 2-process multi-controller build test.

Launched by tests/test_multihost.py as `python multihost_worker.py
<pid> <nproc> <port> <outdir>`: joins a jax.distributed CPU runtime
(4 local devices -> 8 global), trains an IVF-PQ index collectively,
fills it through the multi-host ownership path (per-host encode-result
blocks, per-host spill, single-writer pack, collective install —
ivfpq._fill_encoded_multihost), searches, and writes its results to
<outdir>/res<pid>.json for the parent to compare.
"""

import json
import sys
from pathlib import Path


def main() -> int:
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], Path(sys.argv[4]))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)

    import numpy as np

    from abstracts_search_tpu.index.ivfpq import IVFPQIndex
    from abstracts_search_tpu.parallel.mesh import build_mesh

    # every process derives the SAME corpus (the shared-data model: in
    # production each host reads the shared parquet dir)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4096, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    mesh = build_mesh()
    index = IVFPQIndex(16, 32, pq_m=8, pq_nbits=8, mesh=mesh,
                       spherical=True, storage="device")
    index.train(x[:2048], kmeans_iters=4)

    def chunks():
        for lo in range(0, len(x), 1024):
            yield x[lo:lo + 1024], np.arange(lo, lo + 1024, dtype=np.int64)

    lists_dir = outdir / "lists"
    index.fill_stream(chunks(), lists_dir=lists_dir)

    q = x[::97][:32]
    v, p = index.search(q, 5, nprobe=8)
    (outdir / f"res{pid}.json").write_text(json.dumps({
        "pos": np.asarray(p).tolist(),
        "vals": np.round(np.asarray(v), 4).tolist(),
        "n": int(index.n),
    }))

    # -- phase 2: the REAL driver targets, 2-process ------------------------------
    from abstracts_search_tpu.config import Config
    from abstracts_search_tpu.driver import Driver
    from abstracts_search_tpu.index.tune import read_params
    from abstracts_search_tpu.parallel.mesh import process_barrier
    from abstracts_search_tpu.storage.shards import ShardWriter

    droot = outdir / "drv"
    data_dir = droot / "data"
    if pid == 0:
        w = ShardWriter(data_dir, shard_size=2048, row_group_size=512, dim=32)
        for lo in range(0, len(x), 512):
            w.write([f"W{i}" for i in range(lo, lo + 512)], x[lo:lo + 512])
        w.close()
    process_barrier("worker-data")

    cfg = Config(
        data_dir=str(data_dir), index_dir=str(droot / "idx"),
        store_path=str(droot / "s.sqlite"), events_dir=str(droot / "ev"),
        ivf_centroids=16, train_sample=2048, pq_m=8, pq_nbits=8,
        normalize=True, index_storage="device", embed_dim=32,
        tune_sample=4096,
    )
    drv = Driver(cfg, root=droot, mesh=mesh)
    drv.target_fill(kmeans_iters=4)
    drv.target_tune(n_queries=32, k=5)
    # incremental fill must refuse the delta path on a multi-controller
    # runtime (it streams from a single host's store) and no-op here
    # (up-to-date fingerprint) instead of crashing or building a delta
    drv.target_fill(incremental=True)
    params = read_params(drv.params_path)
    (outdir / f"drv{pid}.json").write_text(json.dumps({
        "recall": params["achieved_recall"],
        "nprobe": params["nprobe"],
        "ids": drv.ids_path.exists(),
        "deltas": len(drv.delta_dirs()),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
