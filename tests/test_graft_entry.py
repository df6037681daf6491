"""Guard the driver-facing entry points (__graft_entry__)."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[1].shape[0]


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    # light mode: the point at non-8 counts is mesh-shape flexibility
    # (hardcoded-8 bugs), not the production serve program the driver
    # already validates at 8 — which costs ~30 s of extra compile
    graft.dryrun_multichip(2, production_geometry=False)
