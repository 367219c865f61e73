"""Mitigation layer: ZNE, twirling, learning decorator, ngem, metrics."""
import numpy as np
import pytest

from mlqem_tpu.circuits.circuit import Circuit, tensorize
from mlqem_tpu.circuits.families import IsingModel, IsingOptions
from mlqem_tpu.circuits.observables import PauliSum, single_z
from mlqem_tpu.device.registry import get_device
from mlqem_tpu.metrics import (Problem, Trial, improvement_factor, rmse)
from mlqem_tpu.mitigation.learning import (EmptyProcessor, ModelProcessor,
                                           ZNEProcessor, learning)
from mlqem_tpu.mitigation.ngem import ngem
from mlqem_tpu.mitigation.twirling import (sample_twirled_circuits,
                                           twirl_circuit, twirl_table)
from mlqem_tpu.mitigation.zne import (ExponentialExtrapolator,
                                      LinearExtrapolator,
                                      PolynomialExtrapolator,
                                      RichardsonExtrapolator, ZNEEstimator,
                                      ZNEStrategy, fold_gates, zne)
from mlqem_tpu.ops.statevector import expval_pauli_sum, statevector
from mlqem_tpu.primitives.estimator import (IdealEstimator, NoisyEstimator)


# ---------------------------------------------------------------------------
# folding + extrapolation
# ---------------------------------------------------------------------------
def test_fold_preserves_unitary():
    qc = Circuit(3).h(0).cx(0, 1).cz(1, 2).rx(0.3, 2).cx(0, 2)
    folded = fold_gates(qc, 3.0, gates_to_fold=2)
    # 3 two-qubit gates → each folded once → +6 gates
    assert len(folded.ops) == len(qc.ops) + 6
    psi0 = np.asarray(statevector(tensorize(qc)))
    psi1 = np.asarray(statevector(tensorize(folded)))
    np.testing.assert_allclose(psi0, psi1, atol=1e-5)


def test_fold_noise_factor_one_is_identity():
    qc = Circuit(2).h(0).cx(0, 1)
    assert len(fold_gates(qc, 1.0).ops) == len(qc.ops)


def test_extrapolators_recover_linear_decay():
    nfs = [1, 3, 5]
    true0 = 0.9
    vals = [true0 * (1 - 0.05 * nf) for nf in nfs]
    for ex in [LinearExtrapolator(), PolynomialExtrapolator(1),
               RichardsonExtrapolator()]:
        got = ex.extrapolate(nfs, vals)
        assert abs(got - true0) < 1e-8, ex
    # exponential decay recovered by the exponential extrapolator
    vals_exp = [0.8 * np.exp(-0.1 * nf) for nf in nfs]
    got = ExponentialExtrapolator().extrapolate(nfs, vals_exp)
    assert abs(got - 0.8) < 1e-6


def test_zne_estimator_beats_noisy():
    dev = get_device("fake_lima")
    ops = IsingOptions.config_4q_paper()
    circs = [IsingModel.make_circs_sweep(ops, s, "Z", measure=False)
             for s in (2, 3)]
    obs = single_z(0, 4)
    ideal = IdealEstimator().run(circs, obs).result().values
    noisy = NoisyEstimator(dev).run(circs, obs).result().values
    zne_est = ZNEEstimator(NoisyEstimator(dev),
                           ZNEStrategy(noise_factors=(1, 3)))
    mitigated = zne_est.run(circs, obs).result()
    err_noisy = rmse(noisy, ideal)
    err_zne = rmse(mitigated.values, ideal)
    assert err_zne < err_noisy
    assert "zne" in mitigated.metadata[0]


def test_zne_class_decorator():
    dev = get_device("fake_lima")
    ZNENoisy = zne(NoisyEstimator)
    est = ZNENoisy(dev, zne_strategy=ZNEStrategy(noise_factors=(1, 3)))
    qc = Circuit(2).h(0).cx(0, 1)
    res = est.run(qc, PauliSum("ZZ")).result()
    assert res.values.shape == (1,)


# ---------------------------------------------------------------------------
# twirling
# ---------------------------------------------------------------------------
def test_twirl_preserves_circuit_action():
    qc = Circuit(3).h(0).cx(0, 1).cz(1, 2).rx(0.4, 0).cx(1, 2)
    psi0 = np.asarray(statevector(tensorize(qc)))
    for seed in range(5):
        tw = twirl_circuit(qc, seed=seed)
        psi1 = np.asarray(statevector(tensorize(tw)))
        # states equal up to global phase
        ov = abs(np.vdot(psi0, psi1))
        assert abs(ov - 1.0) < 1e-5, seed


def test_twirl_table_cx_identity_preserved():
    table = twirl_table("cx")
    assert table[0] == (0, 0)  # I⊗I → I⊗I
    assert len(table) == 16


def test_sample_twirled_circuits():
    qc = Circuit(2).h(0).cx(0, 1)
    twirls = sample_twirled_circuits(qc, 5, seed=0)
    assert len(twirls) == 5
    assert any(len(t.ops) > len(qc.ops) for t in twirls)


def test_twirl_non_clifford_raises():
    with pytest.raises(ValueError):
        twirl_table("rzz")


# ---------------------------------------------------------------------------
# learning decorator
# ---------------------------------------------------------------------------
class _IdentityModel:
    """The reference's DummyModel mock (test_estimator.py:21-27): returns
    the noisy expval unchanged (it sits at feature position -(1+17):
    the expval slot before the 17-dim meas-basis block)."""

    def predict(self, X):
        return np.asarray(X)[:, -18]


class _ScaleModel:
    """Predicts noisy/0.9 — simulating a learned inverse-damping model."""

    def predict(self, X):
        return np.asarray(X)[:, -18] / 0.9


def test_learning_estimator_identity_processor():
    dev = get_device("fake_lima")
    qc = Circuit(4).h(0).cx(0, 1).measure_all()
    obs = single_z(0, 4)
    processor = EmptyProcessor()
    LearningEst = learning(NoisyEstimator, processor, skip_transpile=True)
    est = LearningEst(dev)
    base = NoisyEstimator(dev).run(qc, obs).result().values[0]
    res = est.run(qc, obs).result()
    assert abs(res.values[0] - base) < 1e-9
    assert abs(res.metadata[0]["original_value"] - base) < 1e-9


def test_learning_estimator_model_processor():
    dev = get_device("fake_lima")
    qc = Circuit(4).h(0).cx(0, 1)
    obs = single_z(0, 4)
    processor = ModelProcessor(_IdentityModel(), dev, skip_transpile=True)
    est = learning(NoisyEstimator, processor, skip_transpile=True)(dev)
    res = est.run(qc, obs).result()
    # identity model → mitigated == original noisy value
    assert abs(res.values[0] - res.metadata[0]["original_value"]) < 1e-6
    assert type(est).__name__ == "LearningNoisyEstimator"


def test_learning_estimator_scale_model_improves():
    """A model undoing a known damping must move values toward ideal."""
    dev = get_device("fake_lima")
    ops = IsingOptions.config_4q_paper()
    qc = IsingModel.make_circs_sweep(ops, 3, "Z", measure=False)
    obs = single_z(0, 4)
    ideal = IdealEstimator().run(qc, obs).result().values[0]
    processor = ModelProcessor(_ScaleModel(), dev, skip_transpile=True)
    est = learning(NoisyEstimator, processor, skip_transpile=True)(dev)
    res = est.run(qc, obs).result()
    noisy = res.metadata[0]["original_value"]
    assert abs(res.values[0] - ideal) < abs(noisy - ideal)


def test_zne_processor():
    dev = get_device("fake_lima")
    zne_est = ZNEEstimator(NoisyEstimator(dev))
    proc = ZNEProcessor(zne_est, dev, shots=None)
    qc = Circuit(2).h(0).cx(0, 1)
    obs = PauliSum("ZZ")
    ideal = 1.0
    noisy = NoisyEstimator(dev).run(qc, obs).result().values[0]
    out = proc.process(noisy, qc, obs, ())
    assert abs(out - ideal) < abs(noisy - ideal)


def test_ngem_decorator_with_identity_processor():
    class _P:
        def process(self, expectation_value, circuits, observables,
                    parameter_values):
            return expectation_value

    dev = get_device("fake_lima")
    NgemEst = ngem(NoisyEstimator, _P(), dev)
    est = NgemEst(dev)
    qc = Circuit(2).h(0).cx(0, 1)
    res = est.run(qc, PauliSum("ZZ")).result()
    assert res.values.shape == (1,)
    assert type(est).__name__ == "NgemNoisyEstimator"


def test_ngem_with_gnn_model():
    import jax

    from mlqem_tpu.models.gnn import ExpValCircuitGraphModel3, edge_index_to_adj
    dev = get_device("fake_lima")
    model = ExpValCircuitGraphModel3(hidden_channels=4, exp_value_size=1)
    # init with a dummy batch of the right shapes
    import jax.numpy as jnp
    B, N, E, F = 1, 32, 96, 22
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((B, 1)), jnp.zeros((B, 1, 17)), jnp.zeros((B,)),
        jnp.zeros((B, N, F)), jnp.zeros((B, N, N)),
        jnp.ones((B, N), bool), train=False)
    est = ngem(NoisyEstimator, model, dev, variables=variables,
               pad_nodes=N, pad_edges=E)(dev)
    qc = Circuit(3).h(0).cx(0, 1).cx(1, 2)
    res = est.run(qc, single_z(0, 3)).result()
    assert np.isfinite(res.values[0])


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------
def test_improvement_factor_goldens():
    """The reference's golden values (test_improvement_factor.py:25,44)."""
    factor = improvement_factor(
        problems=[Problem(trials=[Trial(noisy=1.0, mitigated=2.0)],
                          ideal_exp_value=0.0)],
        n_shots=1, n_mitigation_shots=1)
    assert factor == 0.5
    factor2 = improvement_factor(
        problems=[
            (2.0, [(3.0, 4.0), (1.0, 2.0)]),
            (2.0, [(3.0, 4.0)]),
        ],
        n_shots=3, n_mitigation_shots=2)
    assert abs(factor2 - 0.75) < 1e-12


def test_improvement_factor_empty_raises():
    from mlqem_tpu.exceptions import MLQEMException
    with pytest.raises(MLQEMException):
        improvement_factor([], 1, 1)
