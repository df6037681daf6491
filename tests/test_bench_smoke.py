"""Smoke-test the judged artifacts: bench.py runs and emits valid JSON."""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_bench_emits_one_json_line():
    # CPU mode shrinks the corpus (bench.py handles backend detection);
    # force CPU through jax.config the way conftest does, via env knob
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu'); "
         "import runpy, sys; sys.argv=['bench.py']; "
         "runpy.run_path('bench.py', run_name='__main__')"],
        cwd=ROOT, capture_output=True, text=True, timeout=900,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, (out.stdout, out.stderr)
    rec = json.loads(lines[-1])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    # the selection mode is part of the record so rounds are compared
    # like-for-like (fast-mode values are not bit-exact — ADVICE r3)
    assert rec["mode"] == "fast" and "fast selection" in rec["metric"]
    assert rec["value"] > 0
