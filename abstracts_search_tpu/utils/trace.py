"""Stage timers + JAX profiler hooks."""

from __future__ import annotations

import contextlib
import functools
import json
import logging
import os
import time
from pathlib import Path

logger = logging.getLogger(__name__)

PROFILE_ENV = "ASTPU_PROFILE"


class StageTimer:
    """Collects named stage durations; writeable as a JSON report."""

    def __init__(self):
        self.stages: list[dict] = []

    @contextlib.contextmanager
    def stage(self, name: str, **meta):
        t0 = time.perf_counter()
        err = None
        try:
            yield
        except BaseException as e:
            err = repr(e)
            raise
        finally:
            dt = time.perf_counter() - t0
            rec = {"stage": name, "seconds": round(dt, 4), **meta}
            if err:
                rec["error"] = err
            self.stages.append(rec)
            logger.info("stage %s: %.3fs%s", name, dt, f" ({err})" if err else "")

    def report(self) -> dict:
        return {"stages": self.stages, "total_seconds": round(
            sum(s["seconds"] for s in self.stages), 4)}

    def write(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(self.report(), indent=2))


@contextlib.contextmanager
def profile_scope(name: str):
    """Capture a JAX device trace for this scope when ASTPU_PROFILE is set.

    The trace directory loads in TensorBoard / XProf — per-kernel HLO
    timings on the TPU, the 'is the scan bandwidth-bound' question
    answered from data rather than vibes.
    """
    out = os.environ.get(PROFILE_ENV)
    if not out:
        yield
        return
    import jax

    path = str(Path(out) / name)
    with jax.profiler.trace(path):
        yield
    logger.info("profile for %s written under %s", name, path)


def timed(fn):
    """Decorator: log wall-clock of a function call at INFO."""

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            logger.info("%s: %.3fs", fn.__qualname__, time.perf_counter() - t0)

    return wrapper
