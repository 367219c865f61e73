"""Estimator primitive surface tests."""
import numpy as np

from mlqem_tpu.circuits.circuit import Circuit
from mlqem_tpu.circuits.observables import PauliSum, single_z
from mlqem_tpu.circuits.parameters import (Parameter, bind_parameters,
                                           circuit_parameters,
                                           tensorize_template)
from mlqem_tpu.device.registry import get_device
from mlqem_tpu.primitives.estimator import (CountsBackend, IdealEstimator,
                                            NoisyEstimator)


def test_ideal_estimator_bell():
    est = IdealEstimator()
    qc = Circuit(2).h(0).cx(0, 1)
    res = est.run([qc, qc], [PauliSum("ZZ"), PauliSum("XX")]).result()
    np.testing.assert_allclose(res.values, [1.0, 1.0], atol=1e-6)
    assert res.metadata[0]["simulator"] == "statevector"


def test_parameterized_run():
    theta = Parameter("t")
    qc = Circuit(1).rx(theta, 0)
    est = IdealEstimator()
    res = est.run([qc, qc], PauliSum("Z"),
                  parameter_values=[(0.5,), (1.5,)]).result()
    np.testing.assert_allclose(res.values, np.cos([0.5, 1.5]), atol=1e-6)


def test_template_binding():
    theta = Parameter("t")
    qc = Circuit(2).rx(theta, 0).rz(theta * 2.0, 1).cx(0, 1)
    tpl = tensorize_template(qc)
    assert tpl.num_parameters == 1
    ct = tpl.bind(np.array([0.7]))
    params = np.asarray(ct.params)
    assert abs(params[0, 0] - 0.7) < 1e-6
    assert abs(params[1, 0] - 1.4) < 1e-6
    # batched binding broadcasts over the leading axis
    ctb = tpl.bind(np.array([[0.1], [0.2]]))
    assert np.asarray(ctb.params).shape[0] == 2


def test_noisy_estimator_shrinks_expectation():
    dev = get_device("fake_lima")
    qc = Circuit(2).h(0).cx(0, 1)
    ideal = IdealEstimator().run(qc, PauliSum("ZZ")).result().values[0]
    noisy = NoisyEstimator(dev).run(qc, PauliSum("ZZ")).result().values[0]
    assert ideal > noisy > 0.8  # lima-level noise: small but visible


def test_noisy_estimator_readout_effect():
    dev = get_device("fake_lima")
    qc = Circuit(1).x(0)
    with_ro = NoisyEstimator(dev, readout=True).run(
        qc, PauliSum("Z")).result().values[0]
    no_ro = NoisyEstimator(dev, readout=False).run(
        qc, PauliSum("Z")).result().values[0]
    assert with_ro > no_ro  # readout error pulls ⟨Z⟩ = -1 toward 0


def test_noisy_estimator_nondiagonal_obs():
    dev = get_device("fake_lima")
    qc = Circuit(1).h(0)  # |+⟩: ⟨X⟩ = 1 ideally
    val = NoisyEstimator(dev).run(qc, PauliSum("X")).result().values[0]
    assert 0.9 < val < 1.0


def test_noisy_estimator_shots_converges():
    dev = get_device("fake_lima")
    qc = Circuit(2).h(0).cx(0, 1)
    exact = NoisyEstimator(dev).run(qc, PauliSum("ZZ")).result().values[0]
    sampled = NoisyEstimator(dev, shots=20000, seed=3).run(
        qc, PauliSum("ZZ")).result().values[0]
    assert abs(sampled - exact) < 0.02


def test_counts_backend():
    dev = get_device("fake_lima")
    qc = Circuit(2).x(0).measure_all()
    counts = CountsBackend(dev).run_counts([qc], shots=4000)[0]
    assert sum(counts.values()) == 4000
    # dominant outcome: qubit0=1 → bitstring "01"
    assert max(counts, key=counts.get) == "01"


def test_multi_term_observable():
    est = IdealEstimator()
    qc = Circuit(2).h(0).cx(0, 1)
    obs = PauliSum([("ZZ", 0.5), ("XX", 0.25), ("ZI", 2.0)])
    val = est.run(qc, obs).result().values[0]
    assert abs(val - (0.5 + 0.25 + 0.0)) < 1e-6


def test_measurement_grouping_qubitwise_commuting():
    from mlqem_tpu.primitives.estimator import _measurement_groups

    obs = PauliSum([("II", 0.5), ("ZI", 0.2), ("IZ", 0.3), ("ZZ", 0.1),
                    ("XX", 0.4), ("XI", 0.05), ("YY", 0.7)])
    groups = _measurement_groups(obs.terms)
    # II/ZI/IZ/ZZ share the Z basis; XX/XI share X⊗X; YY alone
    assert len(groups) == 3
    sizes = sorted(len(members) for _, members in groups)
    assert sizes == [1, 2, 4]


def test_grouped_estimator_matches_per_term_reference():
    """The batched/grouped path must reproduce independent per-term values."""
    dev = get_device("fake_lima")
    qc = Circuit(2).h(0).cx(0, 1).rx(0.3, 1)
    ham = PauliSum([("II", -1.05), ("ZI", 0.39), ("IZ", -0.39),
                    ("ZZ", -0.01), ("XX", 0.18), ("YY", 0.18)])
    est = NoisyEstimator(dev)
    grouped = est.run([qc], [ham]).result().values[0]
    # reference value: each term evaluated on its own via a fresh estimator
    per_term = 0.0
    for pauli, coeff in ham.to_list():
        v = NoisyEstimator(dev).run([qc], [PauliSum([(pauli, coeff)])])
        per_term += v.result().values[0]
    np.testing.assert_allclose(grouped, per_term, atol=1e-5)


def test_grouped_estimator_shots_shared_per_basis():
    """Sampled path: one shot table per basis group, converges to exact."""
    dev = get_device("fake_lima")
    qc = Circuit(2).h(0).cx(0, 1)
    ham = PauliSum([("ZZ", 0.6), ("IZ", 0.2), ("XX", 0.3)])
    exact = NoisyEstimator(dev).run([qc], [ham]).result().values[0]
    sampled = NoisyEstimator(dev, shots=60000, seed=7).run(
        [qc], [ham]).result().values[0]
    assert abs(sampled - exact) < 0.02
