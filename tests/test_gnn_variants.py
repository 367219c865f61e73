"""GCN/Cheb/SAGE dense convs + the 01_ngem ensemble model + figures."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlqem_tpu.models.gnn import (ChebConvDense, GCNConvDense,
                                  NgemEnsembleModel, SAGEConvDense)


def _graph(B=3, N=6, F=5, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
    adj = jnp.zeros((B, N, N))
    for i in range(N - 1):
        adj = adj.at[:, i + 1, i].set(1.0).at[:, i, i + 1].set(1.0)
    mask = jnp.ones((B, N), bool).at[:, 5:].set(False)
    return x, adj, mask


@pytest.mark.parametrize("cls", [GCNConvDense, ChebConvDense,
                                 SAGEConvDense])
def test_conv_shapes_and_masking(cls):
    x, adj, mask = _graph()
    key = jax.random.PRNGKey(0)
    conv = cls(channels=7)
    variables = conv.init({"params": key}, x, adj, mask)
    out = conv.apply(variables, x, adj, mask)
    assert out.shape == (3, 6, 7)
    np.testing.assert_allclose(np.asarray(out[:, 5:]), 0.0, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ngem_ensemble_forward_and_trains():
    from mlqem_tpu.models.train import gnn_inputs, train_gnn

    rng = np.random.default_rng(1)
    B, N, F = 24, 8, 22
    edges = np.zeros((B, 2, N), np.int32)
    for i in range(N - 1):
        edges[:, 0, i] = i
        edges[:, 1, i] = i + 1
    data = {
        "x": rng.normal(size=(B, N, F)).astype(np.float32),
        "edge_index": edges,
        "edge_mask": np.ones((B, N), bool),
        "node_mask": np.ones((B, N), bool),
        "noisy": rng.uniform(-1, 1, (B, 1)).astype(np.float32),
        "observable": rng.normal(size=(B, 1, 17)).astype(np.float32),
        "circuit_depth": rng.uniform(1, 5, (B,)).astype(np.float32),
    }
    y = data["noisy"] * 1.1
    model = NgemEnsembleModel(hidden_channels=8, exp_value_size=1)
    variables, hist = train_gnn(model, {**data, "y": y}, num_epochs=6,
                                batch_size=12, seed=0)
    assert np.isfinite(hist["train_loss"]).all()


def test_figures_render(tmp_path):
    from mlqem_tpu.workflows.figures import (figure_model_comparison,
                                             figure_trotter_steps,
                                             figure_zne_mimicry,
                                             figure_training_size_sweep)

    table = {"ols": {"rmse_noisy": 0.1, "rmse_mitigated": 0.05},
             "rf": {"rmse_noisy": 0.1, "rmse_mitigated": 0.03}}
    f1 = figure_model_comparison(table, str(tmp_path / "f1.png"))
    steps = list(range(5))
    vals = np.random.default_rng(0).uniform(-1, 1, (5, 4))
    f2 = figure_trotter_steps(steps, vals, vals * 0.9, vals * 0.95,
                              save_path=str(tmp_path / "f2.png"))
    f3 = figure_zne_mimicry(vals, vals * 0.9, vals * 0.97, vals * 0.96,
                            save_path=str(tmp_path / "f3.png"))
    f4 = figure_training_size_sweep(
        [{"train_size": 16, "rmse_mitigated": 0.08, "rmse_noisy": 0.1},
         {"train_size": 64, "rmse_mitigated": 0.05, "rmse_noisy": 0.1}],
        save_path=str(tmp_path / "f4.png"))
    import os
    for f in ("f1", "f2", "f3", "f4"):
        assert os.path.getsize(tmp_path / f"{f}.png") > 1000


def test_figure_paper_parity(tmp_path):
    from mlqem_tpu.workflows.figures import figure_paper_parity

    table = {"incoherent": {
        "ours": {"noisy": 0.05, "random_forest": 0.04, "mlp": 0.02,
                 "ols": 0.05, "gnn": 0.037, "zne": 0.033},
        "published": {"noisy": 0.172, "random_forest": 0.067, "mlp": 0.080,
                      "ols": 0.119, "gnn": 0.130, "zne": 0.127}}}
    f = figure_paper_parity(table, str(tmp_path / "parity.png"))
    assert (tmp_path / "parity.png").exists()
