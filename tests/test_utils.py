"""Aux subsystems: stage timers, profile hooks, embedder registry, config."""

import json

import numpy as np
import pytest

from abstracts_search_tpu.config import Config, load_config
from abstracts_search_tpu.models.registry import HashEmbedder, get_embedder
from abstracts_search_tpu.utils import StageTimer, profile_scope


def test_stage_timer_collects_and_writes(tmp_path):
    t = StageTimer()
    with t.stage("a", rows=10):
        pass
    with pytest.raises(ValueError):
        with t.stage("b"):
            raise ValueError("boom")
    rep = t.report()
    assert [s["stage"] for s in rep["stages"]] == ["a", "b"]
    assert rep["stages"][0]["rows"] == 10
    assert "boom" in rep["stages"][1]["error"]
    t.write(tmp_path / "r.json")
    assert json.loads((tmp_path / "r.json").read_text())["total_seconds"] >= 0


def test_profile_scope_noop_without_env(monkeypatch):
    monkeypatch.delenv("ASTPU_PROFILE", raising=False)
    with profile_scope("x"):
        pass  # must not require jax / write anything


def test_hash_embedder_deterministic_and_normalized():
    e = HashEmbedder(32)
    a = e(["hello", "world"])
    b = e(["hello", "world"])
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-6)
    assert not np.allclose(a[0], a[1])
    assert e([]).shape == (0, 32)
    # queries == corpus space for the hash stand-in
    np.testing.assert_array_equal(e.queries(["hello"]), e(["hello"]))


def test_registry_dispatch():
    cfg = Config(embed_dim=8)
    assert isinstance(get_embedder("hash", cfg), HashEmbedder)
    with pytest.raises(ValueError):
        get_embedder("nope", cfg)
    # auto falls back to hash when stella weights are unreachable
    emb = get_embedder("auto", cfg)
    assert emb(["x"]).shape == (1, 8)


def test_config_env_layering(tmp_path, monkeypatch):
    (tmp_path / "env.json").write_text(json.dumps({"embed_dim": 64, "pq_m": 32}))
    monkeypatch.setenv("ASTPU_EMBED_DIM", "128")       # env beats env.json
    monkeypatch.setenv("SIDECARSEARCH_MODEL", "some/model")
    cfg = load_config(tmp_path, ivf_centroids=99)      # override beats all
    assert cfg.embed_dim == 128
    assert cfg.pq_m == 32
    assert cfg.model_name == "some/model"
    assert cfg.ivf_centroids == 99


def test_watchdog_info_records_beat_without_logging_config(tmp_path):
    """for_benchmark must count INFO progress records as beats even when
    the process never configured logging (root at WARNING filters INFO
    at the logger, starving the handler — round-4 advisor medium: the
    deadline became absolute-from-start and hard-killed healthy long
    benchmarks with a false "device unreachable" record)."""
    import subprocess
    import sys

    code = """
import logging, time
from abstracts_search_tpu.utils.watchdog import Watchdog

wd = Watchdog.for_benchmark("t", timeout_s=1.0)
log = logging.getLogger("abstracts_search_tpu.test")
t0 = time.monotonic()
while time.monotonic() - t0 < 2.5:      # > 2x the deadline
    log.info("progress")                # INFO must re-arm the watchdog
    time.sleep(0.25)
wd.stop()
print("SURVIVED")
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=60, cwd="/root/repo")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "SURVIVED" in r.stdout
    assert "device unreachable" not in r.stdout


def test_watchdog_does_not_leak_info_to_existing_handlers():
    """attach_to_logging must get INFO beats flowing WITHOUT changing
    what the process prints: a pre-existing handler whose threshold came
    from the root logger's WARNING level must not start emitting INFO
    records, and stop() must restore both levels (round-5 review: bare
    setLevel(INFO) polluted stderr for the rest of the process)."""
    import io
    import logging

    from abstracts_search_tpu.utils.watchdog import Watchdog

    root = logging.getLogger()
    prev_handlers, prev_level = root.handlers[:], root.level
    stream = io.StringIO()
    user_handler = logging.StreamHandler(stream)     # level NOTSET
    try:
        root.handlers[:] = [user_handler]
        root.setLevel(logging.WARNING)

        wd = Watchdog(timeout_s=60.0).start().attach_to_logging()
        log = logging.getLogger("abstracts_search_tpu.test_leak")
        log.info("beat record")
        assert wd._beat.is_set()                     # the beat flowed
        assert "beat record" not in stream.getvalue()  # but never printed
        log.warning("warn record")
        assert "warn record" in stream.getvalue()    # warnings unchanged

        wd.stop()
        assert root.level == logging.WARNING
        assert user_handler.level == logging.NOTSET
        assert root.handlers == [user_handler]       # beat handler removed
    finally:
        root.handlers[:] = prev_handlers
        root.setLevel(prev_level)


def test_watchdog_fires_when_silent(tmp_path):
    """And the converse: a silent (wedged) run still gets the honest
    failure record + hard exit."""
    import json
    import subprocess
    import sys

    code = """
import time
from abstracts_search_tpu.utils.watchdog import Watchdog

wd = Watchdog.for_benchmark("t", timeout_s=0.5)
time.sleep(10)
print("SHOULD NOT GET HERE")
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=60, cwd="/root/repo")
    assert r.returncode == 3
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert "device unreachable" in rec["error"]
    assert rec["benchmark"] == "t"
