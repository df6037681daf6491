"""Utilities: tracing/profiling, stage timing (SURVEY.md §5).

The reference has zero observability (its only instrument is mbuffer's
disabled buffer display, Makefile:62). Here: wall-clock stage timers on
every driver target plus opt-in JAX device profiling
(``ASTPU_PROFILE=<dir>`` captures a TensorBoard-loadable trace of the
kernels in any stage).
"""

from .prefetch import prefetch_iterator
from .trace import StageTimer, profile_scope, timed
from .watchdog import Watchdog

__all__ = ["StageTimer", "Watchdog", "prefetch_iterator", "profile_scope",
           "timed"]
