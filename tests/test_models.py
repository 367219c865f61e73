"""Model zoo: MLPs, linear, random forest, GNN + training loops."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlqem_tpu.models.forest import RandomForestRegressor
from mlqem_tpu.models.gnn import (ExpValCircuitGraphModel,
                                  ExpValCircuitGraphModel3,
                                  TransformerConvDense, edge_index_to_adj)
from mlqem_tpu.models.linear import LinearRegression
from mlqem_tpu.models.mlp import MLP1, MLP2, MLP3
from mlqem_tpu.models.train import (PlateauScheduler, load_checkpoint,
                                    predict, save_checkpoint, train_gnn,
                                    train_mlp, gnn_inputs, mlp_inputs)


def test_linear_regression_exact():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(50, 3))
    w = np.array([1.5, -2.0, 0.5])
    y = X @ w + 0.7
    lr = LinearRegression().fit(X, y)
    np.testing.assert_allclose(lr.coef_, w, atol=1e-8)
    assert abs(lr.intercept_ - 0.7) < 1e-8
    np.testing.assert_allclose(lr.predict(X), y, atol=1e-5)


def test_linear_regression_multioutput():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(40, 4))
    W = rng.normal(size=(2, 4))
    y = X @ W.T
    lr = LinearRegression().fit(X, y)
    np.testing.assert_allclose(lr.predict(X), y, atol=1e-5)


def test_random_forest_fits_noise_free():
    rng = np.random.default_rng(2)
    X = rng.uniform(-1, 1, size=(300, 5)).astype(np.float32)
    y = np.sign(X[:, 0]) * 0.5 + (X[:, 1] > 0.3) * 0.25
    rf = RandomForestRegressor(n_estimators=20, random_state=0)
    rf.fit(X, y)
    pred = rf.predict(X)
    rmse = np.sqrt(np.mean((pred - y) ** 2))
    assert rmse < 0.05  # trees to purity → near-interpolation on train


def test_random_forest_generalizes():
    rng = np.random.default_rng(3)
    X = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    y = X[:, 0] * 0.8 - 0.2 * X[:, 1]
    rf = RandomForestRegressor(n_estimators=30, random_state=1)
    rf.fit(X[:400], y[:400])
    pred = rf.predict(X[400:])
    rmse = np.sqrt(np.mean((pred - y[400:]) ** 2))
    assert rmse < 0.12


def test_random_forest_multioutput():
    rng = np.random.default_rng(4)
    X = rng.uniform(-1, 1, size=(200, 4)).astype(np.float32)
    y = np.stack([X[:, 0], -X[:, 1]], axis=1)
    rf = RandomForestRegressor(n_estimators=10, random_state=2)
    rf.fit(X, y)
    assert rf.predict(X).shape == (200, 2)


def test_mlp_shapes():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((8, 58))
    for cls, kwargs in [(MLP1, {}), (MLP2, {}), (MLP3, {})]:
        model = cls(hidden_size=64, output_size=4, **kwargs)
        variables = model.init({"params": key, "dropout": key}, x,
                               train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (8, 4)


def test_train_mlp_learns_identity_mitigation():
    """MLP learns noisy→ideal scaling y = x/0.8 on synthetic data."""
    rng = np.random.default_rng(5)
    ideal = rng.uniform(-1, 1, size=(400, 1)).astype(np.float32)
    noisy = ideal * 0.8 + rng.normal(0, 0.01, size=ideal.shape)
    model = MLP1(hidden_size=32, output_size=1)
    variables, hist = train_mlp(model, noisy.astype(np.float32), ideal,
                                num_epochs=150, batch_size=64,
                                learning_rate=3e-3, seed=0)
    preds = predict(model, variables, mlp_inputs,
                    {"X": noisy.astype(np.float32)})
    rmse = float(np.sqrt(np.mean((preds - ideal) ** 2)))
    raw = float(np.sqrt(np.mean((noisy - ideal) ** 2)))
    assert rmse < raw * 0.3, (rmse, raw)
    assert hist["val_loss"][-1] < hist["val_loss"][0]


def test_transformer_conv_masking():
    key = jax.random.PRNGKey(0)
    B, N, F = 2, 6, 5
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, N, F)),
                    jnp.float32)
    adj = jnp.zeros((B, N, N)).at[:, 1, 0].set(1.0).at[:, 2, 1].set(1.0)
    mask = jnp.ones((B, N), bool).at[:, 4:].set(False)
    conv = TransformerConvDense(channels=3, heads=2)
    variables = conv.init({"params": key}, x, adj, mask)
    out = conv.apply(variables, x, adj, mask)
    assert out.shape == (B, N, 6)
    # masked-out nodes produce zeros
    np.testing.assert_allclose(np.asarray(out[:, 4:]), 0.0, atol=1e-6)


def test_asa_pooling_shrinks_to_kept_prefix():
    """ASAPooling returns statically-shrunk arrays: shape bound
    ceil(ratio*N), per-sample kept count = ceil(ratio*n_valid) as a
    CONTIGUOUS prefix (the shrink's correctness precondition), dropped
    rows/cols zeroed."""
    from mlqem_tpu.models.gnn import ASAPoolingDense

    rng = np.random.default_rng(3)
    B, N, C = 4, 11, 6
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    adj = jnp.asarray((rng.random((B, N, N)) < 0.3).astype(np.float32))
    mask_np = np.ones((B, N), bool)
    mask_np[1, 8:] = False
    mask_np[3, 5:] = False
    mask = jnp.asarray(mask_np)
    pool = ASAPoolingDense(C, ratio=0.5)
    v = pool.init(jax.random.PRNGKey(0), x, adj, mask)
    x2, adj2, keep = map(np.asarray, pool.apply(v, x, adj, mask))
    n_keep = int(np.ceil(0.5 * N))
    assert x2.shape == (B, n_keep, C)
    assert adj2.shape == (B, n_keep, n_keep)
    for b in range(B):
        kc = int(np.ceil(0.5 * mask_np[b].sum()))
        assert keep[b].sum() == kc
        assert keep[b, :kc].all() and not keep[b, kc:].any(), keep[b]
        np.testing.assert_allclose(x2[b, kc:], 0.0)
        np.testing.assert_allclose(adj2[b, kc:, :], 0.0)
        np.testing.assert_allclose(adj2[b, :, kc:], 0.0)


def _toy_graph_data(B=20, N=8, F=22, K=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, N, F)).astype(np.float32)
    edges = np.zeros((B, 2, N), np.int32)
    for b in range(B):
        for i in range(N - 1):
            edges[b, 0, i] = i
            edges[b, 1, i] = i + 1
    data = {
        "x": x,
        "edge_index": edges,
        "edge_mask": np.ones((B, N), bool),
        "node_mask": np.ones((B, N), bool),
        "noisy": rng.uniform(-1, 1, size=(B, K)).astype(np.float32),
        "observable": rng.normal(size=(B, 1, 17)).astype(np.float32),
        "circuit_depth": rng.uniform(1, 5, size=(B,)).astype(np.float32),
    }
    y = data["noisy"] * 1.2
    return data, y


def test_gnn_forward_and_training():
    data, y = _toy_graph_data()
    model = ExpValCircuitGraphModel3(hidden_channels=15, exp_value_size=4)
    variables, hist = train_gnn(model, {**data, "y": y}, num_epochs=8,
                                batch_size=10, learning_rate=1e-3, seed=0)
    preds = predict(model, variables, gnn_inputs, data)
    assert preds.shape == (20, 4)
    assert np.isfinite(hist["train_loss"]).all()


def test_checkpoint_roundtrip(tmp_path):
    model = MLP1(hidden_size=8, output_size=1)
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 5))
    variables = model.init({"params": key}, x, train=False)
    p = str(tmp_path / "ckpt.pkl")
    save_checkpoint(p, variables, {"note": "test"})
    loaded, extra = load_checkpoint(p, variables)
    assert extra["note"] == "test"
    out1 = model.apply(variables, x, train=False)
    out2 = model.apply(loaded, x, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_plateau_scheduler():
    sch = PlateauScheduler(factor=0.5, patience=1)
    lr = 1.0
    lr = sch.step(1.0, lr)   # best
    lr = sch.step(1.1, lr)   # bad 1
    assert lr == 1.0
    lr = sch.step(1.2, lr)   # bad 2 > patience → reduce
    assert lr == 0.5


def test_random_forest_sklearn_parity():
    """Accuracy parity with sklearn's RandomForestRegressor on the same
    task (the reference's model; BASELINE config #2)."""
    sklearn = pytest.importorskip("sklearn.ensemble")
    rng = np.random.default_rng(7)
    X = rng.uniform(-1, 1, size=(600, 8)).astype(np.float32)
    y = (np.sin(2 * X[:, 0]) + 0.5 * X[:, 1] * X[:, 2]
         + 0.1 * rng.normal(size=600)).astype(np.float32)
    Xtr, ytr, Xte, yte = X[:480], y[:480], X[480:], y[480:]
    ours = RandomForestRegressor(n_estimators=60, random_state=0)
    ours.fit(Xtr, ytr)
    rmse_ours = float(np.sqrt(np.mean((ours.predict(Xte) - yte) ** 2)))
    ref = sklearn.RandomForestRegressor(n_estimators=60, random_state=0)
    ref.fit(Xtr, ytr)
    rmse_ref = float(np.sqrt(np.mean((ref.predict(Xte) - yte) ** 2)))
    # within 15% of sklearn's error on held-out data
    assert rmse_ours < rmse_ref * 1.15, (rmse_ours, rmse_ref)


def test_random_forest_sklearn_parity_tied_features():
    """Parity on TIE-HEAVY data (discrete duplicated features + noisy
    labels — the demo1 mimic task's shape).  Guards the split-search
    randomization: float64 SSE + uniform tie choice; a deterministic
    argmin correlates the trees toward degenerate 1-sample splits and
    measured ~30% worse than sklearn here."""
    sklearn = pytest.importorskip("sklearn.ensemble")
    rng = np.random.default_rng(11)
    step = np.repeat(np.arange(1, 5), 50).astype(np.float32)
    Jv = np.tile(rng.uniform(0, 2, 50), 4).astype(np.float32)
    noisy = (np.cos(step * 0.4) * np.exp(-0.3 * Jv)
             + 0.05 * rng.normal(size=200)).astype(np.float32)
    y = (np.cos(step * 0.4) * np.exp(-0.25 * Jv)
         + 0.03 * rng.normal(size=200)).astype(np.float32)
    X = np.column_stack([step, Jv, noisy])
    tr = np.concatenate([np.arange(s * 50, s * 50 + 10) for s in range(4)])
    te = np.setdiff1d(np.arange(200), tr)
    ours = RandomForestRegressor(n_estimators=100, random_state=0)
    ours.fit(X[tr], y[tr])
    rmse_ours = float(np.sqrt(np.mean((ours.predict(X[te]) - y[te]) ** 2)))
    ref = sklearn.RandomForestRegressor(n_estimators=100, random_state=0)
    ref.fit(X[tr], y[tr])
    rmse_ref = float(np.sqrt(np.mean((ref.predict(X[te]) - y[te]) ** 2)))
    assert rmse_ours < rmse_ref * 1.15, (rmse_ours, rmse_ref)
