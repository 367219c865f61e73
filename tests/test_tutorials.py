"""Smoke-execute the numbered tutorial series (reference 01-07 parity).

Each tutorial honors MLQEM_TUT_FAST=1 so the whole series stays test-sized;
the assertions are that each script runs end-to-end and prints its
notebook's headline metric.
"""
import os
import runpy

import pytest

TUTORIALS = [
    "01_ngem.py",
    "02_data_generation.py",
    "03_experiments_on_lima_backend.py",
    "04_ngem_vqe.py",
    "05_stability_over_time.py",
    "06_scalability.py",
    "07_generalization.py",
    "a1_simulation_engines.py",
    "a2_scale_100q.py",
    "a3_multichip_sharding.py",
    "z01_mlp_debug.py",
]

TUT_DIR = os.path.join(os.path.dirname(__file__), "..", "docs", "tutorials")


@pytest.mark.parametrize("script", TUTORIALS)
def test_tutorial_runs(script, capsys, monkeypatch):
    monkeypatch.setenv("MLQEM_TUT_FAST", "1")
    runpy.run_path(os.path.join(TUT_DIR, script), run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{script} printed nothing"
    # every tutorial ends by printing its headline metric line
    assert any(key in out for key in
               ("RMSE", "rmse", "circuits/sec", "gap", "error", "<Z")), out
