"""Auxiliary subsystems: job ledger/resubmission, profiling, RL stubs."""
import os

import numpy as np
import pytest

from mlqem_tpu.circuits.circuit import Circuit
from mlqem_tpu.circuits.observables import PauliSum
from mlqem_tpu.ngs import NGSAgent, NGSEnvironment, NGSModel
from mlqem_tpu.primitives.estimator import IdealEstimator
from mlqem_tpu.rl import ActionResult, Agent, Environment
from mlqem_tpu.utils.jobs import JobLedger, run_with_resubmission
from mlqem_tpu.utils.profiling import StageTimer


def test_job_ledger_roundtrip(tmp_path):
    path = str(tmp_path / "jobs.json")
    ledger = JobLedger(path)
    est = IdealEstimator()
    qc = Circuit(2).h(0).cx(0, 1)

    def submit(key):
        return est.run(qc, PauliSum("ZZ"))

    run_with_resubmission(ledger, submit, ["a", "b"])
    assert ledger.records["a"].status == "DONE"
    assert abs(ledger.records["a"].values[0] - 1.0) < 1e-6
    # resume from disk: nothing resubmitted, state preserved
    ledger2 = JobLedger(path)
    assert ledger2.records["b"].status == "DONE"
    assert ledger2.pending_or_failed() == []


def test_job_resubmission_on_failure(tmp_path):
    path = str(tmp_path / "jobs.json")
    ledger = JobLedger(path)
    attempts = {"n": 0}
    est = IdealEstimator()
    qc = Circuit(1).x(0)

    def flaky_submit(key):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient backend failure")
        return est.run(qc, PauliSum("Z"))

    run_with_resubmission(ledger, flaky_submit, ["job1"], max_attempts=5)
    rec = ledger.records["job1"]
    assert rec.status == "DONE"
    assert rec.attempts == 3
    assert abs(rec.values[0] + 1.0) < 1e-6


def test_job_permanent_failure(tmp_path):
    ledger = JobLedger(str(tmp_path / "jobs.json"))

    def always_fails(key):
        raise ValueError("no backend")

    run_with_resubmission(ledger, always_fails, ["x"], max_attempts=2)
    rec = ledger.records["x"]
    assert rec.status == "FAILED"
    assert rec.attempts == 2
    assert "no backend" in rec.error


def test_stage_timer():
    t = StageTimer()
    with t.stage("encode"):
        sum(range(1000))
    with t.stage("encode"):
        sum(range(1000))
    assert t.counts["encode"] == 2
    assert "encode" in t.report()
    assert t.throughput("encode", 100) > 0


def test_rl_ngs_scaffolding():
    env = NGSEnvironment(circuit="c", noise_model="n")
    assert env.get_state() == ("c", "n")
    agent = NGSAgent(env)
    with pytest.raises(NotImplementedError):
        agent.select_action(None)
    r = ActionResult(state=1, reward=0.5)
    assert r.reward == 0.5
    assert NGSModel is not None
    with pytest.raises(NotImplementedError):
        Environment().get_state()


def test_tpu_compute_up_cpu_fast_path():
    """On a CPU-forced env (conftest sets JAX_PLATFORMS=cpu) the probe
    must short-circuit True without spawning a subprocess — a long probe
    here would mean every CPU bench/probe run pays a 240s timeout."""
    import time

    from mlqem_tpu.utils.platform import tpu_compute_up

    t0 = time.time()
    assert tpu_compute_up(timeout_s=5) is True
    assert time.time() - t0 < 1.0


def test_dm_precision_knob_default_highest():
    """The exact dm engine contracts at true-f32 (HIGHEST) unless the
    probe knob MLQEM_DM_PRECISION overrides it (read at import)."""
    import jax

    from mlqem_tpu.ops import density_static

    assert density_static._PREC == jax.lax.Precision.HIGHEST
