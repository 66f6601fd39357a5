"""bench.py must always be runnable: the driver executes it at round end."""

import importlib
import json
import sys

import pytest

pytest.importorskip("jax")


def test_bench_runs_tiny(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_ENGINE", "jnp")
    monkeypatch.setenv("BENCH_FOV_X", "3")
    monkeypatch.setenv("BENCH_FOV_Y", "2")
    monkeypatch.setenv("BENCH_RAYS_PER_FOV", "64")
    monkeypatch.setenv("BENCH_CELLS_PER_BATCH", "18")
    monkeypatch.setenv("BENCH_MAX_BOUNCES", "300")
    sys.modules.pop("bench", None)
    bench = importlib.import_module("bench")
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "ray-bounces/sec/chip"
    assert out["value"] > 0
    assert out["unit"] == "bounces/s"
    assert 0 <= out["vs_baseline"] == round(out["value"] / 1e9, 4)
