"""VQE application: optimizers, separate_observables, H2 problems."""
import numpy as np
import pytest

from mlqem_tpu.apps.chemistry import load_h2_problems
from mlqem_tpu.apps.vqe import VQE, exact_minimum_eigenvalue, spsa_minimize
from mlqem_tpu.circuits.families import two_local_ansatz
from mlqem_tpu.circuits.observables import PauliSum
from mlqem_tpu.device.registry import get_device
from mlqem_tpu.mitigation.learning import EmptyProcessor, learning
from mlqem_tpu.primitives.estimator import IdealEstimator, NoisyEstimator


def test_exact_eigenvalue():
    # H = Z ⊗ Z + 0.5 X⊗I → min eigenvalue analytic
    op = PauliSum([("ZZ", 1.0), ("XI", 0.5)])
    w = exact_minimum_eigenvalue(op)
    ref = np.linalg.eigvalsh(op.to_matrix())[0]
    assert abs(w - ref) < 1e-10


def test_vqe_single_qubit():
    # H = Z: ground state |1⟩, E = -1; ansatz ry(θ)
    ansatz = two_local_ansatz(1, reps=1, entanglement="linear")
    vqe = VQE(IdealEstimator(), ansatz, optimizer="cobyla", maxiter=80,
              seed=1)
    res = vqe.compute_minimum_eigenvalue(PauliSum("Z"))
    assert abs(res.eigenvalue - (-1.0)) < 1e-3
    assert res.cost_function_evals > 0


def test_vqe_h2_ideal():
    problems = load_h2_problems()
    assert len(problems) >= 10
    length, fci, ham = problems[4]  # ~0.7-0.75 A, near equilibrium
    exact = exact_minimum_eigenvalue(ham)
    ansatz = two_local_ansatz(2, reps=2, entanglement="linear")
    vqe = VQE(IdealEstimator(), ansatz, optimizer="cobyla", maxiter=200,
              seed=0)
    res = vqe.compute_minimum_eigenvalue(ham)
    assert res.eigenvalue <= exact + 0.02
    # FCI energy from the file matches exact diagonalization closely
    assert abs(exact - fci) < 0.02


def test_vqe_separate_observables_equivalent():
    ham = PauliSum([("ZZ", 0.5), ("XX", 0.3), ("IZ", -0.2)])
    ansatz = two_local_ansatz(2, reps=1, entanglement="linear")
    theta = np.linspace(0.1, 0.9, len(
        __import__("mlqem_tpu.circuits.parameters",
                   fromlist=["circuit_parameters"]
                   ).circuit_parameters(ansatz)))
    v1 = VQE(IdealEstimator(), ansatz, separate_observables=False)
    v2 = VQE(IdealEstimator(), ansatz, separate_observables=True)
    e1 = v1._energy(ham, theta)
    e2 = v2._energy(ham, theta)
    assert abs(e1 - e2) < 1e-6


def test_vqe_with_learning_estimator():
    """VQE composes with the mitigated estimator (T7's pipeline shape)."""
    dev = get_device("fake_lima")
    LearningEst = learning(NoisyEstimator, EmptyProcessor(),
                           skip_transpile=True)
    est = LearningEst(dev)
    ansatz = two_local_ansatz(2, reps=1, entanglement="linear")
    vqe = VQE(est, ansatz, optimizer="cobyla", maxiter=30,
              separate_observables=True, seed=2)
    res = vqe.compute_minimum_eigenvalue(PauliSum([("ZZ", 1.0)]))
    assert res.eigenvalue < -0.8  # noisy but close to -1


def test_spsa_minimizes_quadratic():
    res = spsa_minimize(lambda x: float(np.sum((x - 1.5) ** 2)),
                        np.zeros(3), maxiter=300, seed=0)
    assert res.fun < 0.1
