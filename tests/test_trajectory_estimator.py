"""TrajectoryEstimator: generic noisy backend beyond dm widths."""
import numpy as np
import pytest

from mlqem_tpu.circuits.circuit import Circuit
from mlqem_tpu.circuits.families import IsingModel, IsingOptions, random_circuit
from mlqem_tpu.circuits.observables import PauliSum, single_z
from mlqem_tpu.device.registry import configurable_device, get_device
from mlqem_tpu.mitigation.zne import ZNEEstimator, ZNEStrategy
from mlqem_tpu.primitives.estimator import IdealEstimator, NoisyEstimator
from mlqem_tpu.primitives.trajectory_estimator import TrajectoryEstimator

DEV = get_device("fake_lima")


def test_matches_dm_estimator_small():
    qc = IsingModel.make_circs_sweep(IsingOptions.config_4q_paper(), 2,
                                     "Z", measure=False)
    obs = single_z(0, 4)
    dm_val = NoisyEstimator(DEV).run(qc, obs).result().values[0]
    tr_val = TrajectoryEstimator(DEV, n_traj=3000).run(
        qc, obs).result().values[0]
    # twirl bias + trajectory error budget
    assert abs(tr_val - dm_val) < 0.04


def test_nondiagonal_observable():
    qc = Circuit(3).h(0).cx(0, 1).cx(1, 2)
    val = TrajectoryEstimator(DEV if False else get_device("fake_lima"),
                              n_traj=2000).run(
        qc, PauliSum("XXX")).result().values[0]
    ideal = IdealEstimator().run(qc, PauliSum("XXX")).result().values[0]
    assert 0.7 < val <= ideal + 0.02


def test_wide_circuit_16q():
    dev = configurable_device(16, seed=0)
    ops = IsingOptions(nq=16, h=1.0, J=0.2, dt=0.5, depth=2)
    qc = IsingModel.make_circuit(ops, measure=False)
    est = TrajectoryEstimator(dev, n_traj=128)
    vals = est.run([qc, qc], [single_z(0, 16), single_z(8, 16)]
                   ).result().values
    assert np.all(np.abs(vals) <= 1.0)
    ideal = IdealEstimator().run(qc, single_z(8, 16)).result().values[0]
    assert abs(vals[1]) < abs(ideal) + 0.05  # noise damps


def test_composes_with_zne():
    qc = IsingModel.make_circs_sweep(IsingOptions.config_4q_paper(), 3,
                                     "Z", measure=False)
    obs = single_z(0, 4)
    ideal = IdealEstimator().run(qc, obs).result().values[0]
    base = TrajectoryEstimator(DEV, n_traj=3000, seed=5)
    noisy = base.run(qc, obs).result().values[0]
    zne_est = ZNEEstimator(base, ZNEStrategy(noise_factors=(1, 3)))
    mit = zne_est.run(qc, obs).result().values[0]
    assert abs(mit - ideal) < abs(noisy - ideal) + 0.01
