"""Kicked-Ising Pauli-frame engine: exactness vs the reference engines."""
import numpy as np
import pytest

from mlqem_tpu.circuits.circuit import stack_circuits, tensorize
from mlqem_tpu.circuits.families import IsingModel, IsingOptions
from mlqem_tpu.circuits.observables import single_z
from mlqem_tpu.device.noise import NoiseModel, compile_noise_table
from mlqem_tpu.device.registry import get_device
from mlqem_tpu.ops.channels import depolarizing_channel
from mlqem_tpu.ops.density import batch_density_matrices, dm_probabilities
from mlqem_tpu.ops.kicked_ising import KickedIsingEngine, wht
from mlqem_tpu.ops.statevector import statevector, z_expectations
from mlqem_tpu.primitives.estimator import IdealEstimator

DEV = get_device("fake_lima")


def _reference_circuits(nq, steps, dt, J_values):
    return [IsingModel.make_circs_sweep(
        IsingOptions(nq=nq, h=1.0, J=float(j), dt=dt), steps, "Z",
        measure=False) for j in J_values]


def test_wht_is_hadamard_transform():
    import jax.numpy as jnp

    from mlqem_tpu.circuits.circuit import Circuit

    n = 3
    qc = Circuit(n).h(0).h(1).h(2)
    ref = np.asarray(statevector(tensorize(qc)))
    state = jnp.zeros((1, 2 ** n), jnp.complex64).at[0, 0].set(1.0)
    got = np.asarray(wht(state, n))[0]
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_ideal_labels_exact():
    J = np.array([0.15, 0.35, 0.5], np.float32)
    eng = KickedIsingEngine(DEV, nq=4, steps=3, dt=0.5, n_traj=8,
                            shots=None, readout=False,
                            noise_model=NoiseModel(4))
    ideal, noisy = eng.generate(J, seed=0)
    circs = _reference_circuits(4, 3, 0.5, J)
    ref = np.stack([[IdealEstimator().run(c, single_z(q, 4)).result(
    ).values[0] for q in range(4)] for c in circs])
    np.testing.assert_allclose(ideal, ref, atol=1e-4)
    # no noise channels → noisy trajectories equal the ideal state
    np.testing.assert_allclose(noisy, ref, atol=1e-4)


def test_noisy_matches_exact_dm_for_pauli_noise():
    J = np.array([0.15, 0.4], np.float32)
    nm = NoiseModel(4).add_all_qubit_quantum_error(
        depolarizing_channel(0.03, 2), "cx")
    eng = KickedIsingEngine(DEV, nq=4, steps=3, dt=0.5, n_traj=4000,
                            shots=None, readout=False, noise_model=nm)
    _, noisy = eng.generate(J, seed=0)
    circs = _reference_circuits(4, 3, 0.5, J)
    ct = stack_circuits(circs)
    keys, table = compile_noise_table(ct, nm)
    z_dm = np.asarray(z_expectations(
        dm_probabilities(batch_density_matrices(ct, keys, table)), 4))
    assert np.max(np.abs(noisy - z_dm)) < 0.03


def test_full_device_noise_with_readout():
    from mlqem_tpu.parallel.datagen import IsingLabelPipeline

    J = np.array([0.15, 0.4], np.float32)
    eng = KickedIsingEngine(DEV, nq=4, steps=3, dt=0.5, n_traj=4000,
                            shots=None)
    _, noisy = eng.generate(J, seed=1)
    p_dm = IsingLabelPipeline(DEV, nq=4, steps=3, dt=0.5, shots=None)
    _, z_dm = p_dm.generate(J, seed=0)
    assert np.max(np.abs(noisy - z_dm)) < 0.06


def test_rejects_rotation_noise():
    nm = NoiseModel(4).add_all_qubit_quantum_error(
        depolarizing_channel(0.01, 1), "rx")
    with pytest.raises(ValueError):
        KickedIsingEngine(DEV, nq=4, steps=2, noise_model=nm)


def test_shot_sampling_converges():
    J = np.array([0.3], np.float32)
    eng_exact = KickedIsingEngine(DEV, nq=4, steps=2, dt=0.5, n_traj=2000,
                                  shots=None)
    eng_shots = KickedIsingEngine(DEV, nq=4, steps=2, dt=0.5, n_traj=2000,
                                  shots=200000)
    _, a = eng_exact.generate(J, seed=0)
    _, b = eng_shots.generate(J, seed=0)
    assert np.max(np.abs(a - b)) < 0.03


def test_zne_sweep_wide():
    """The 20Q ZNE+twirl baseline workflow (12q here to keep CPU CI fast;
    the TPU path runs the full 20q config in docs/tutorials)."""
    from mlqem_tpu.device.registry import configurable_device
    from mlqem_tpu.workflows.zne_scale import zne_sweep_ising

    dev12 = configurable_device(12, seed=0)
    out = zne_sweep_ising(dev12, nq=12, steps=2,
                          J_values=np.linspace(0.1, 0.5, 4),
                          n_traj=256, shots=None, seed=0)
    assert out["rmse_zne"] < out["rmse_noisy"]


def test_wht_mm_matches_butterfly():
    """The radix-128 matmul WHT (MXU fast path for wide light-cone
    windows) is the same transform as the butterfly at every width and
    factor split, complex and real."""
    from mlqem_tpu.ops.kicked_ising import wht_mm

    rng = np.random.default_rng(3)
    for nq in (3, 7, 9, 14):
        x = (rng.standard_normal((2, 2 ** nq))
             + 1j * rng.standard_normal((2, 2 ** nq))).astype(np.complex64)
        np.testing.assert_allclose(np.asarray(wht_mm(x, nq)),
                                   np.asarray(wht(x, nq)),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(wht_mm(x.real, nq)),
                                   np.asarray(wht(x.real, nq)), atol=2e-5)


def test_wht_mm_width_guard():
    """Widths beyond the einsum-letter budget raise a clear error instead
    of a malformed subscript failure."""
    from mlqem_tpu.ops.kicked_ising import wht_mm

    with pytest.raises(ValueError, match="wht_mm supports"):
        wht_mm(np.zeros((1, 2)), 57)
