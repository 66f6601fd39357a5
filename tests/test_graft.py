"""Driver entry points must compile and run on the virtual CPU mesh."""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = fn(*args)
    jax.block_until_ready(out)
    rays_f, bounces = out
    assert int(bounces) > 0
    assert np.asarray(rays_f["dep"]).shape[0] == len(np.asarray(args[0]["x"]))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)
