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
