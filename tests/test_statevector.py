"""Statevector engine correctness vs dense linear algebra.

Mirrors the reference's validation strategy of closed-form Clifford labels
(``docs/tutorials/mbd_utils.py:208-259``) plus direct matrix checks the
reference lacked.
"""
import numpy as np
import pytest

from mlqem_tpu.circuits.circuit import Circuit, stack_circuits, tensorize
from mlqem_tpu.circuits.gates import (GATE_NAMES, GATE_NUM_PARAMS,
                                      GATE_NUM_QUBITS, gate_unitary,
                                      is_structural)
from mlqem_tpu.circuits.observables import PauliSum, all_z, random_pauli_sum, single_z
from mlqem_tpu.ops.statevector import (all_z_expectation, batch_statevectors,
                                       expval_pauli_sum, probabilities,
                                       statevector, z_expectations)


def dense_unitary(circuit: Circuit) -> np.ndarray:
    """Reference implementation: full 2**n dense matrix product."""
    n = circuit.num_qubits
    dim = 2 ** n
    u_full = np.eye(dim, dtype=np.complex128)
    for op in circuit.ops:
        if is_structural(op.name):
            continue
        u = gate_unitary(op.name, op.params)
        mat = np.eye(dim, dtype=np.complex128)
        if u.shape == (2, 2):
            a = op.qubits[0]
            for j in range(dim):
                for va in range(2):
                    pass
            # build via kron ordering: qubit q is bit q (little-endian)
            ops_list = [np.eye(2)] * n
            ops_list[a] = u
            mat = np.array([[1.0]])
            for q in reversed(range(n)):  # highest qubit leftmost in kron
                mat = np.kron(mat, ops_list[q])
        else:
            a, b = op.qubits[0], op.qubits[1]
            mat = np.zeros((dim, dim), dtype=np.complex128)
            for j in range(dim):
                va, vb = (j >> a) & 1, (j >> b) & 1
                m_in = 2 * va + vb
                rest = j & ~((1 << a) | (1 << b))
                for m_out in range(4):
                    wa, wb = (m_out >> 1) & 1, m_out & 1
                    k = rest | (wa << a) | (wb << b)
                    mat[k, j] = u[m_out, m_in]
        u_full = mat @ u_full
    return u_full


def dense_statevector(circuit: Circuit) -> np.ndarray:
    dim = 2 ** circuit.num_qubits
    psi = np.zeros(dim, dtype=np.complex128)
    psi[0] = 1.0
    return dense_unitary(circuit) @ psi


def test_bell_state():
    qc = Circuit(2).h(0).cx(0, 1)
    psi = np.asarray(statevector(tensorize(qc)))
    expected = np.zeros(4, dtype=complex)
    expected[0b00] = expected[0b11] = 1 / np.sqrt(2)
    np.testing.assert_allclose(psi, expected, atol=1e-6)


def test_ghz_5q():
    qc = Circuit(5).h(0)
    for q in range(4):
        qc.cx(q, q + 1)
    psi = np.asarray(statevector(tensorize(qc)))
    expected = np.zeros(32, dtype=complex)
    expected[0] = expected[31] = 1 / np.sqrt(2)
    np.testing.assert_allclose(psi, expected, atol=1e-6)


@pytest.mark.parametrize("name", [
    g for g in GATE_NAMES if not is_structural(g)])
def test_every_gate_vs_dense(name, rng):
    """Each gate applied at random positions matches the dense product."""
    n = 4
    qc = Circuit(n)
    qc.h(0).h(1).h(2).h(3)        # non-trivial input state
    qc.t(0).cx(0, 2)
    nq = GATE_NUM_QUBITS[name]
    npar = GATE_NUM_PARAMS[name]
    params = tuple(rng.uniform(-np.pi, np.pi, npar))
    if nq == 1:
        qc.append(name, (2,), params)
        qc.append(name, (0,), params)
    else:
        qc.append(name, (1, 3), params)
        qc.append(name, (3, 0), params)
    psi = np.asarray(statevector(tensorize(qc)))
    np.testing.assert_allclose(psi, dense_statevector(qc), atol=1e-5)


def test_random_circuits_vs_dense(rng):
    from mlqem_tpu.circuits.gates import GATE_IDS
    usable = [g for g in GATE_NAMES if not is_structural(g)]
    for trial in range(5):
        n = int(rng.integers(2, 6))
        qc = Circuit(n)
        for _ in range(30):
            name = usable[int(rng.integers(len(usable)))]
            npar = GATE_NUM_PARAMS[name]
            params = tuple(rng.uniform(-np.pi, np.pi, npar))
            if GATE_NUM_QUBITS[name] == 1:
                qc.append(name, (int(rng.integers(n)),), params)
            else:
                a, b = rng.choice(n, 2, replace=False)
                qc.append(name, (int(a), int(b)), params)
        psi = np.asarray(statevector(tensorize(qc)))
        np.testing.assert_allclose(psi, dense_statevector(qc), atol=1e-4,
                                   err_msg=f"trial {trial}")


def test_pauli_expectations_vs_dense(rng):
    n = 4
    qc = Circuit(n)
    for _ in range(20):
        qc.ry(float(rng.uniform(-3, 3)), int(rng.integers(n)))
        a, b = rng.choice(n, 2, replace=False)
        qc.cx(int(a), int(b))
    psi = np.asarray(statevector(tensorize(qc)))
    obs = random_pauli_sum(n, 5, seed=7)
    got = float(expval_pauli_sum(psi, obs))
    expected = float(np.real(np.conj(psi) @ obs.to_matrix() @ psi))
    assert abs(got - expected) < 1e-5


def test_single_z_and_all_z(rng):
    n = 3
    qc = Circuit(n).x(0).h(1)
    psi = np.asarray(statevector(tensorize(qc)))
    probs = np.asarray(probabilities(psi))
    zq = np.asarray(z_expectations(probs, n))
    # qubit0 flipped → ⟨Z_0⟩ = -1; qubit1 in |+⟩ → 0; qubit2 |0⟩ → +1
    np.testing.assert_allclose(zq, [-1.0, 0.0, 1.0], atol=1e-6)
    for q in range(n):
        via_pauli = float(expval_pauli_sum(psi, single_z(q, n)))
        assert abs(via_pauli - zq[q]) < 1e-6
    np.testing.assert_allclose(
        float(all_z_expectation(probs, n)),
        float(expval_pauli_sum(psi, all_z(n))), atol=1e-6)


def test_batched_matches_single(rng):
    circuits = []
    for seed in range(8):
        qc = Circuit(3)
        r = np.random.default_rng(seed)
        for _ in range(10):
            qc.rx(float(r.uniform(-3, 3)), int(r.integers(3)))
            qc.cz(0, int(r.integers(1, 3)))
        circuits.append(qc)
    ct = stack_circuits(circuits)
    batch = np.asarray(batch_statevectors(ct))
    for i, qc in enumerate(circuits):
        single = np.asarray(statevector(tensorize(qc, ct.max_ops)))
        np.testing.assert_allclose(batch[i], single, atol=1e-6)


def test_single_qubit_circuit():
    qc = Circuit(1).h(0)
    psi = np.asarray(statevector(tensorize(qc)))
    # padded to 2 qubits internally; qubit 1 stays |0⟩
    np.testing.assert_allclose(psi[:2], [1 / np.sqrt(2)] * 2, atol=1e-6)
    np.testing.assert_allclose(psi[2:], [0, 0], atol=1e-6)
