"""Real 2-process multi-controller build test (round-2 VERDICT #7).

Two actual `jax.distributed` CPU processes (4 local devices each, 8
global) run the SAME collective program: train -> multi-host fill
(per-host encode blocks + per-host spill + single-writer pack +
collective install) -> search. The parent asserts both processes agree,
the result is correct against self-retrieval, and the per-host spill
ownership actually split the rows.

The reference is single-node (SURVEY.md §5 has no multi-host analog);
this is the TPU framework's scale-out build path (DESIGN.md §7).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_fill_ownership(tmp_path):
    worker = Path(__file__).parent / "multihost_worker.py"
    port = _free_port()
    env = dict(os.environ)
    # keep the TPU plugin's sitecustomize importable but force no TPU:
    # the workers pin the cpu platform before first backend use
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = f"{repo}:{env.get('PYTHONPATH', '')}"

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port),
             str(tmp_path)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    res = [json.loads((tmp_path / f"res{i}.json").read_text())
           for i in range(2)]
    # both controllers saw the same replicated result
    assert res[0] == res[1]
    assert res[0]["n"] == 4096

    # correctness: queries are corpus rows; top-1 should be the row
    # itself for almost all queries (PQ distortion allows a few misses)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4096, 32)).astype(np.float32)
    expect = np.arange(4096)[::97][:32]
    top1 = np.asarray(res[0]["pos"])[:, 0]
    assert (top1 == expect).mean() >= 0.9, (top1, expect)

    # ownership: each host spilled a non-trivial share, covering all rows
    owners = sorted(tmp_path.glob("lists/.owner_p*.json"))
    assert len(owners) == 2
    rows = [json.loads(p.read_text())["rows"] for p in owners]
    assert sum(rows) == 4096
    assert min(rows) >= 1024, rows

    # -- driver phase: target_fill + target_tune ran 2-process ---------------
    drv = [json.loads((tmp_path / f"drv{i}.json").read_text())
           for i in range(2)]
    assert drv[0] == drv[1]
    # the driver-phase corpus is unstructured Gaussian: exact top-5 of a
    # sampled row is a near-tie set PQ8 cannot fully resolve, so recall
    # here measures determinism + plumbing, not ranking quality (the
    # bimodal virtual corpus covers that — tests/test_virtual.py)
    assert drv[0]["recall"] >= 0.45, drv
    assert drv[0]["ids"]    # single-writer ids.parquet landed
    assert drv[0]["deltas"] == 0   # incremental refused the delta path
    downers = sorted(tmp_path.glob("drv/idx/index/lists/.owner_p*.json"))
    assert len(downers) == 2
    drows = [json.loads(p.read_text())["rows"] for p in downers]
    assert sum(drows) == 4096 and min(drows) >= 1024, drows
