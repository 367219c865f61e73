"""Circuit families, encoders, graph encoding, generators, stabilizer."""
import os

import numpy as np
import pytest

from mlqem_tpu.circuits.circuit import Circuit, tensorize
from mlqem_tpu.circuits.families import (IsingModel, IsingOptions,
                                         construct_mbl_circ_with_cut,
                                         construct_mbl_circuit,
                                         generate_composed_clifford,
                                         generate_disorder, random_circuit,
                                         random_clifford_circuit,
                                         construct_tiling, two_local_ansatz)
from mlqem_tpu.circuits.observables import PauliSum, all_z, single_z
from mlqem_tpu.circuits.parameters import circuit_parameters
from mlqem_tpu.data.encoders import (cal_all_z_exp, cal_z_exp, calc_imbalance,
                                     count_gates_by_rotation_angle,
                                     encode_data, encode_data_v2_ecr,
                                     encode_pauli_sum_op, marginal_counts)
from mlqem_tpu.data.generators import (ExpValueEntry, exp_value_generator,
                                       generate_exp_val_dataset,
                                       generate_rb_circuit, rb_generator)
from mlqem_tpu.data.graph import (circuit_to_graph_data_json,
                                  num_node_features, stack_graphs)
from mlqem_tpu.data.loaders import (ExpValDataset, load_entries,
                                    save_entries_json)
from mlqem_tpu.device.registry import get_device
from mlqem_tpu.ops.stabilizer import (StabilizerState, batch_expectations,
                                      construct_random_clifford,
                                      force_nonzero_expectation)
from mlqem_tpu.ops.statevector import expval_pauli_sum, statevector


# ---------------------------------------------------------------------------
# families
# ---------------------------------------------------------------------------
def test_ising_model_structure():
    ops = IsingOptions.config_4q_paper()
    qc = IsingModel.make_circs_sweep(ops, 2, "Z")
    counts = qc.count_ops()
    # per step: 4 rx + (2 even bonds × 2 cx) + (1 odd bond × 2 cx) + 3 rz
    assert counts["rx"] == 8
    assert counts["cx"] == 12
    assert counts["rz"] == 6
    assert counts["measure"] == 4
    assert qc.metadata["measure_basis"] == "Z"
    qx = IsingModel.make_circs_sweep(ops, 1, "X")
    assert qx.count_ops()["h"] == 4


def test_ising_zero_steps_domain():
    # 0 Trotter steps: state = |0000⟩, ⟨Z_q⟩ = +1
    ops = IsingOptions.config_4q_paper()
    qc = IsingModel.make_circs_sweep(ops, 0, "Z", measure=False)
    psi = statevector(tensorize(qc))
    for q in range(4):
        assert abs(float(expval_pauli_sum(psi, single_z(q, 4))) - 1) < 1e-6


def test_mbl_circuit():
    dis = generate_disorder(6, seed=3)
    qc = construct_mbl_circuit(6, dis, 0.05 * np.pi, 2, measure=False)
    # domain wall: odd qubits flipped at step 0
    qc0 = construct_mbl_circuit(6, dis, 0.0, 0, measure=False)
    psi = statevector(tensorize(qc0))
    probs = np.abs(np.asarray(psi)) ** 2
    # |q5..q0⟩ odd qubits 1,3,5 set → bits 1,3,5 → index 0b101010
    assert probs[0b101010] > 0.999
    assert qc.count_ops()["cz"] == 2 * (3 + 2)


def test_mbl_cut_bonds():
    dis = generate_disorder(8, seed=1)
    full = construct_mbl_circ_with_cut(8, dis, 0.1, 2, [])
    cut = construct_mbl_circ_with_cut(8, dis, 0.1, 2, [(1, 2), (5, 6)])
    assert full.count_ops()["cz"] - cut.count_ops()["cz"] == 4


def test_two_local_ansatz():
    qc = two_local_ansatz(4, reps=3, entanglement="full")
    params = circuit_parameters(qc)
    assert len(params) == 16  # (3+1) rotation layers × 4 qubits
    assert qc.count_ops()["cz"] == 3 * 6


def test_tiling_and_composed():
    active = random_circuit(3, 4, seed=0)
    tiled = construct_tiling(active, 10, offset=2, measure=False)
    assert tiled.num_qubits == 10
    assert all(2 <= q <= 4 for op in tiled.ops for q in op.qubits)
    comp = generate_composed_clifford(5, 4, 3, seed=1)
    assert comp.num_qubits == 20


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------
def test_encode_data_shape_58():
    """FakeLima 4q reference shape: 8 + 6 + 40 + 4 = 58 features."""
    dev = get_device("fake_lima")
    props = dev.properties()
    assert len(props["gates_set"]) == 6  # cx id reset rz sx x
    qc = Circuit(4).rx(0.4, [0, 1, 2, 3]).cx(0, 1)
    X, y = encode_data([qc], props, [[1, -1, 1, -1]],
                       [[0.9, -0.9, 0.8, -0.8]], 4)
    assert X.shape == (1, 58)
    # device stat block is scaled ×100 and nonzero
    assert X[0, 0] > 0
    # gate counts: cx=1 at sorted position 0, scaled 0.01
    assert abs(X[0, 8] - 0.01) < 1e-6
    # noisy expvals land in the tail slice
    np.testing.assert_allclose(X[0, -4:], [0.9, -0.9, 0.8, -0.8], atol=1e-6)
    np.testing.assert_allclose(y[0], [1, -1, 1, -1])


def test_device_stat_vector_excludes_qubit0():
    """Reference parity: ``if parent_key`` is falsy for the int key 0, so
    qubit 0's t1/t2/readout_error are EXCLUDED from the device-stat averages
    (``mlp.py:143`` truthiness quirk). Values hand-computed from a synthetic
    snapshot including qubit 0."""
    from mlqem_tpu.data.encoders import device_stat_vector

    props = {
        "name": "synthetic",
        "gates_set": ["cx", "id", "rz", "sx", "x"],
        "num_qubits": 3,
        "qubits_props": {
            0: {"index": 0, "t1": 10.0, "t2": 20.0, "readout_error": 0.5},
            1: {"index": 1, "t1": 100.0, "t2": 200.0, "readout_error": 0.01},
            2: {"index": 2, "t1": 300.0, "t2": 400.0, "readout_error": 0.03},
        },
        "gate_props": {
            "cx0_1": {"index": "cx0_1", "gate_error": 0.010,
                      "gate_length": 300.0},
            "cx1_2": {"index": "cx1_2", "gate_error": 0.030,
                      "gate_length": 300.0},
            "id0": {"index": "id0", "gate_error": 0.0002,
                    "gate_length": 35.0},
            "sx1": {"index": "sx1", "gate_error": 0.0004,
                    "gate_length": 35.0},
            "x2": {"index": "x2", "gate_error": 0.0008, "gate_length": 35.0},
            "rz0": {"index": "rz0", "gate_error": 0.0, "gate_length": 0.0},
        },
    }
    vec = device_stat_vector(props)
    # substring quirk: 'x' average includes cx0_1, cx1_2, sx1, x2
    want = np.array([
        np.mean([0.010, 0.030]),                     # cx
        0.0002,                                      # id
        0.0004,                                      # sx
        np.mean([0.010, 0.030, 0.0004, 0.0008]),     # x (substring quirk)
        0.0,                                         # rz
        np.mean([0.01, 0.03]),                       # readout, NO qubit 0
        np.mean([100.0, 300.0]),                     # t1, NO qubit 0
        np.mean([200.0, 400.0]),                     # t2, NO qubit 0
    ]) * 100.0
    np.testing.assert_allclose(vec, want, rtol=1e-6)


def test_encode_data_with_meas_basis():
    dev = get_device("fake_lima")
    props = dev.properties()
    qc = Circuit(4).rx(0.4, 0)
    basis = encode_pauli_sum_op(PauliSum("XYZI"))
    X, _ = encode_data([qc], props, [[0.0]], [[0.7]], 1, meas_bases=basis)
    assert X.shape == (1, 8 + 6 + 40 + 1 + 17)
    # encoded basis: coeff 1 then X→[0,0,0,1], Y→[0,0,1,0], Z→[0,1,0,0], I
    np.testing.assert_allclose(
        X[0, -17:], [1, 0, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 0])


def test_encode_data_v2_ecr_shape():
    qc = Circuit(4).rx(0.4, 0).sx(1)
    X, y = encode_data_v2_ecr([qc], [[1, 1, 1, 1]], [[0.9, 0.9, 0.9, 0.9]],
                              4, two_q_gate="ecr")
    assert X.shape == (1, 5 + 160 + 4)


def test_angle_histogram_bins():
    qc = Circuit(2).rx(0.05, 0).rz(-0.05, 1).ry(2 * np.pi - 0.01, 0)
    counts = count_gates_by_rotation_angle(qc, 0.1 * np.pi)
    assert counts.sum() == 3
    assert len(counts) == 40


def test_cal_z_exp_and_all_z():
    counts = {"00": 500, "11": 500}
    z = cal_z_exp(counts)
    np.testing.assert_allclose(z, [0.0, 0.0])
    assert abs(cal_all_z_exp(counts) - 1.0) < 1e-9
    counts2 = {"01": 1000}
    np.testing.assert_allclose(cal_z_exp(counts2), [-1.0, 1.0])
    assert cal_all_z_exp(counts2) == -1.0
    # marginalization
    counts3 = {"011": 10, "111": 30}
    m = marginal_counts(counts3, [0, 1])
    assert m == {"11": 40}


def test_calc_imbalance():
    # step 0 domain wall z = [+1, -1, +1, -1] (qubits 0..3)
    z = [[1, -1, 1, -1]]
    ib = calc_imbalance(z, even_qubits=[0, 2], odd_qubits=[1, 3])
    np.testing.assert_allclose(ib, [1.0])


# ---------------------------------------------------------------------------
# graph encoding
# ---------------------------------------------------------------------------
def test_graph_encoding_node_features():
    dev = get_device("fake_lima")
    props = dev.properties()
    qc = Circuit(2).x(1).x(0).barrier().rz(0.4, 0).rz(0.4, 1).measure_all()
    g = circuit_to_graph_data_json(qc, props, use_gate_features=True,
                                   use_qubit_features=True)
    feats = g["nodes"]["DAGOpNode"]
    expected_dim = num_node_features(props)
    assert expected_dim == 3 + 6 + 2 + 9 + 2  # 22 for lima
    assert all(len(f) == expected_dim for f in feats)
    # ops: x, x, barrier, rz, rz, barrier, measure, measure = 8 nodes
    assert len(feats) == 8
    ei = g["edges"]["DAGOpNode_wire_DAGOpNode"]["edge_index"]
    assert len(ei[0]) > 0
    batch = stack_graphs([g, g])
    assert batch["x"].shape[0] == 2


# ---------------------------------------------------------------------------
# generators + loaders
# ---------------------------------------------------------------------------
def test_generate_exp_val_dataset_and_roundtrip(tmp_path):
    dev = get_device("fake_lima")
    entries = generate_exp_val_dataset(dev, n_qubits=3, circuit_depth=2,
                                       pauli_terms=1, num_entries=4, seed=5)
    assert len(entries) == 4
    for e in entries:
        assert -1.01 <= e.ideal_exp_value <= 1.01
        assert len(e.noisy_exp_values) == 1
    path = os.path.join(tmp_path, "ds.json")
    save_entries_json(entries, path)
    loaded = load_entries(path)
    assert len(loaded) == 4
    assert loaded[0].ideal_exp_value == entries[0].ideal_exp_value
    ds = ExpValDataset(path)
    arr = ds.arrays
    assert arr["x"].shape[0] == 4
    assert arr["y"].shape == (4,)
    # self loops appended
    assert arr["edge_mask"].sum() > arr["node_mask"].sum()


def test_exp_value_generator_stream():
    dev = get_device("fake_lima")
    gen = exp_value_generator(dev, 2, 2, 1, max_entries=3, batch_size=2)
    entries = list(gen)
    assert len(entries) == 3
    assert all(isinstance(e, ExpValueEntry) for e in entries)


def test_rb_circuit_composes_to_identity():
    for seed in range(3):
        qc = generate_rb_circuit(1, 6, seed=seed)
        psi = np.asarray(statevector(tensorize(qc)))
        assert abs(abs(psi[0]) - 1.0) < 1e-5  # returns to |0⟩
    qc2 = generate_rb_circuit(2, 3, seed=0)
    psi2 = np.asarray(statevector(tensorize(qc2)))
    assert abs(abs(psi2[0]) - 1.0) < 1e-5


def test_rb_generator_yields():
    dev = get_device("fake_lima")
    out = list(rb_generator(dev, qubits=(0,), lengths=(3,), num_samples=2))
    assert len(out) == 2
    entry, circ, obs = out[0]
    assert isinstance(entry, ExpValueEntry)
    assert circ.num_qubits == dev.num_qubits


# ---------------------------------------------------------------------------
# stabilizer engine
# ---------------------------------------------------------------------------
def test_stabilizer_vs_statevector(rng):
    for seed in range(6):
        n = int(rng.integers(2, 5))
        qc = random_clifford_circuit(n, 4, seed=seed)
        st = StabilizerState.from_circuit(qc)
        psi = statevector(tensorize(qc))
        for _ in range(4):
            s = "".join(rng.choice(list("IXYZ")) for _ in range(n))
            obs = PauliSum(s)
            tab_val = st.expectation(obs)
            sv_val = float(expval_pauli_sum(psi, obs))
            assert abs(tab_val - sv_val) < 1e-5, (seed, s)


def test_stabilizer_ghz():
    qc = Circuit(3).h(0).cx(0, 1).cx(1, 2)
    st = StabilizerState.from_circuit(qc)
    assert st.expectation(PauliSum("ZZZ")) == 0.0
    assert st.expectation(PauliSum("XXX")) == 1.0
    assert st.expectation(PauliSum("ZZI")) == 1.0


def test_force_nonzero_expectation():
    for seed in range(5):
        qc = random_clifford_circuit(4, 5, seed=seed)
        try:
            forced, expect = force_nonzero_expectation(qc)
        except UserWarning:
            continue
        psi = statevector(tensorize(forced))
        got = float(expval_pauli_sum(psi, all_z(4)))
        assert abs(got - expect) < 1e-5


def test_stabilizer_100q_scales():
    qc = generate_composed_clifford(20, 5, 3, seed=2)  # 100 qubits
    st = StabilizerState.from_circuit(qc)
    val = st.expectation(single_z(0, 100))
    assert val in (-1.0, 0.0, 1.0)
    vals = batch_expectations(
        [generate_composed_clifford(20, 5, 2, seed=s) for s in range(3)],
        single_z(3, 100))
    assert vals.shape == (3,)


def test_homogeneous_graph_golden_shapes():
    """Reference golden shapes (tests/data/test_utils.py:13-25):
    2q H+CX+measure_all → x (5, 34), edge_index (2, 5)."""
    from mlqem_tpu.data.graph import circuit_to_homogeneous_graph

    qc = Circuit(2).h(0).cx(0, 1).measure_all()
    g = circuit_to_homogeneous_graph(qc)
    assert g["x"].shape == (5, 34)
    assert g["edge_index"].shape == (2, 5)
    assert g["circuit_depth"] == qc.depth()
    # first node is the H gate: one-hot at the 'h' vocabulary slot
    from mlqem_tpu.circuits.gates import REFERENCE_VOCAB
    assert g["x"][0, REFERENCE_VOCAB.index("h")] == 1.0


def test_stabilizer_400q_smoke():
    """The reference's scalability sweep tops out at 400 qubits
    (06_scalability.ipynb); one composed-Clifford circuit + single-Z
    expectation must run at that width."""
    from mlqem_tpu.circuits.families import generate_composed_clifford
    from mlqem_tpu.circuits.observables import single_z
    from mlqem_tpu.ops.stabilizer import StabilizerState

    qc = generate_composed_clifford(5, 80, depth=2, seed=3)
    assert qc.num_qubits == 400
    st = StabilizerState.from_circuit(qc)
    val = st.expectation(single_z(0, 400))
    assert val in (-1.0, 0.0, 1.0)
