"""Transpiler lowering + QASM interchange."""
import numpy as np
import pytest

from mlqem_tpu.circuits.circuit import Circuit, tensorize
from mlqem_tpu.circuits.families import random_circuit
from mlqem_tpu.circuits.gates import GATE_NUM_PARAMS, gate_unitary
from mlqem_tpu.device.registry import get_device
from mlqem_tpu.ops.statevector import statevector
from mlqem_tpu.transpile.lower import transpile
from mlqem_tpu.transpile.qasm import from_qasm, to_qasm


def _fidelity(qc1, qc2):
    max_ops = max(qc1.num_nonstructural_ops(), qc2.num_nonstructural_ops())
    psi1 = np.asarray(statevector(tensorize(qc1, max_ops)))
    psi2 = np.asarray(statevector(tensorize(qc2, max_ops)))
    return abs(np.vdot(psi1, psi2))


def test_transpile_preserves_state_cx_basis(rng):
    for seed in range(5):
        qc = random_circuit(4, 4, seed=seed)
        qc.h(0)  # ensure nontrivial state
        low = transpile(qc, basis=("cx", "id", "rz", "sx", "x"))
        names = {op.name for op in low.ops}
        assert names <= {"cx", "id", "rz", "sx", "x", "barrier", "measure"}
        assert _fidelity(qc, low) > 1 - 1e-5, seed


def test_transpile_ecr_basis():
    qc = Circuit(3).h(0).cx(0, 1).cz(1, 2).rx(0.3, 2)
    low = transpile(qc, basis=("ecr", "id", "rz", "sx", "x"))
    names = {op.name for op in low.ops}
    assert "ecr" in names and "cx" not in names
    assert _fidelity(qc, low) > 1 - 1e-5


def test_transpile_routing_on_lima():
    dev = get_device("fake_lima")
    qc = Circuit(5).h(0).cx(0, 4)  # 0 and 4 not coupled on the T topology
    low = transpile(qc, basis=dev.basis_gates,
                    coupling_map=dev.coupling_map)
    pairs = {tuple(p) for p in dev.coupling_map}
    for op in low.ops:
        if op.name == "cx":
            assert tuple(op.qubits) in pairs
    # state on the involved logical qubits is preserved up to the final
    # layout permutation — verify via the 2q marginal entropy signature:
    # the Bell pair exists somewhere
    psi = np.asarray(statevector(tensorize(low)))
    probs = np.abs(psi) ** 2
    assert abs(probs.max() - 0.5) < 1e-5  # two equal 0.5 amplitudes


def test_qasm_roundtrip(rng):
    for seed in range(4):
        qc = random_circuit(3, 4, seed=seed)
        qc.measure_all()
        text = to_qasm(qc)
        back = from_qasm(text)
        assert back.num_qubits == qc.num_qubits
        assert back.count_ops() == qc.count_ops()
        assert _fidelity(qc, back) > 1 - 1e-6


def test_qasm_pi_expressions():
    text = """OPENQASM 2.0;
include "qelib1.inc";
qreg q[2];
creg meas[2];
rz(pi/2) q[0];
sx q[0];
rz(-pi/4) q[1];
cx q[0],q[1];
measure q[0] -> meas[0];
measure q[1] -> meas[1];
"""
    qc = from_qasm(text)
    assert qc.count_ops() == {"rz": 2, "sx": 1, "cx": 1, "measure": 2}
    assert abs(qc.ops[0].params[0] - np.pi / 2) < 1e-12


def test_qasm_rejects_bad_expression():
    with pytest.raises(ValueError):
        from_qasm('OPENQASM 2.0;\nqreg q[1];\nrz(__import__) q[0];')


def test_circuit_draw():
    qc = Circuit(3).h(0).cx(0, 1).rz(0.5, 1).cz(1, 2).barrier()
    qc.measure_all()
    text = qc.draw()
    assert "q0:" in text and "q2:" in text
    assert "H" in text and "RZ(0.50)" in text and "M" in text
    assert len(text.split("\n")) == 3


def test_ecr_cross_engine_consistency():
    """Dense ECR == qiskit's documented matrix == every decomposition.

    Regression for a round-1 bug where the dense matrix implemented
    ECR(b, a): qiskit's label 'IX' puts X on the FIRST qarg, so in our
    a=MSB convention ECR(a,b) = (X⊗I - Y⊗X)/sqrt(2).
    """
    from mlqem_tpu.transpile.lower import _cx_via_ecr, _ecr_via_cx

    def compose(ops, n=2):
        u = np.eye(2 ** n, dtype=complex)
        eye = np.eye(2, dtype=complex)
        for op in ops:
            g = gate_unitary(op.name, op.params)
            if g.shape == (2, 2):
                full = np.kron(g, eye) if op.qubits[0] == 0 \
                    else np.kron(eye, g)
            else:
                assert tuple(op.qubits) == (0, 1)
                full = g
            u = full @ u
        return u

    def match_up_to_phase(u, v):
        k = np.argmax(np.abs(v))
        phase = v.flat[k] / u.flat[k]
        assert abs(abs(phase) - 1) < 1e-9
        assert np.allclose(u * phase, v, atol=1e-9)

    ecr = gate_unitary("ecr")
    # qiskit's documented matrix (little-endian: first qarg = LSB); convert
    # by the index permutation sigma = [0, 2, 1, 3]
    mq = np.array([[0, 1, 0, 1j], [1, 0, -1j, 0],
                   [0, 1j, 0, 1], [-1j, 0, 1, 0]]) / np.sqrt(2)
    sig = [0, 2, 1, 3]
    assert np.allclose(ecr, mq[np.ix_(sig, sig)], atol=1e-12)
    # transpiler lowering ECR -> cx basis
    match_up_to_phase(compose(_ecr_via_cx(0, 1)), ecr)
    # cx via ecr corrections
    cx = gate_unitary("cx")
    match_up_to_phase(compose(_cx_via_ecr(0, 1)), cx)
    # stabilizer decomposition (host-side primitive template)
    from mlqem_tpu.ops.stabilizer import _CLIFFORD_DECOMP
    from mlqem_tpu.circuits.circuit import Op
    prims = {"h": "h", "s": "s", "cx": "cx"}
    ops = []
    for kind, slots in _CLIFFORD_DECOMP["ecr"]:
        if kind == "cx":
            ops.append(Op("cx", (slots[0], slots[1])))
        else:
            ops.append(Op(prims[kind], (slots,)))
    match_up_to_phase(compose(ops), ecr)
    # batched unitary table (ops/unitaries.py) agrees with gate_unitary
    from mlqem_tpu.circuits.gates import GATE_IDS
    from mlqem_tpu.ops.unitaries import op_unitaries
    mats = np.asarray(op_unitaries(
        np.array([GATE_IDS["ecr"]], np.int32), np.zeros((1, 3), np.float32)))
    assert np.allclose(mats[0], ecr, atol=1e-6)
