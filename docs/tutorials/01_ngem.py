"""Tutorial 01 — ngem: GNN-ensemble mitigation behind the Estimator.

Mirrors the reference's ``01_ngem.ipynb``: generate an expectation-value
dataset under the fake-lima noise model, train the GCN/Cheb/SAGE ensemble
(``NgemEnsembleModel``), report its test RMSE against the noisy baseline
(the metric the notebook plots), then deploy the trained model behind the
Estimator primitive with ``ngem()``.

Run: python docs/tutorials/01_ngem.py            (~2 min CPU)
Set MLQEM_TUT_FAST=1 for a reduced smoke-test size.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run from a source checkout
if _os.environ.get("JAX_PLATFORMS"):   # honored even where jax is
    import jax as _jax                 # pre-imported at startup
    _jax.config.update("jax_platforms",
                       _os.environ["JAX_PLATFORMS"])

import os

import numpy as np

from mlqem_tpu import NoisyEstimator, get_device, single_z
from mlqem_tpu.data.generators import generate_exp_val_dataset
from mlqem_tpu.data.loaders import ExpValDataset
from mlqem_tpu.metrics import rmse
from mlqem_tpu.mitigation.ngem import ngem
from mlqem_tpu.models.gnn import NgemEnsembleModel
from mlqem_tpu.models.train import gnn_inputs, predict, train_gnn

FAST = os.environ.get("MLQEM_TUT_FAST") == "1"
dev = get_device("fake_lima")

# --- dataset: random 4q circuits, ideal + noisy single-Z labels -------------
entries = generate_exp_val_dataset(dev, n_qubits=4, circuit_depth=3,
                                   num_entries=60 if FAST else 200, seed=0)
ds = ExpValDataset(entries)
arrays = dict(ds.arrays)
y = arrays.pop("y")
obs = arrays["observable"]
if obs.ndim == 3:                      # pool variable-term observables
    arrays["observable"] = obs.mean(axis=1)

rng = np.random.default_rng(0)
idx = rng.permutation(y.shape[0])
n_test = max(1, y.shape[0] // 5)
te, tr = idx[:n_test], idx[n_test:]

# --- the 01_ngem ensemble: parallel GCN / Cheb / SAGE stacks -----------------
model = NgemEnsembleModel(hidden_channels=16, exp_value_size=1, dropout=0.0)
variables, _ = train_gnn(
    model, {**{k: v[tr] for k, v in arrays.items()}, "y": y[tr]},
    num_epochs=40 if FAST else 150, batch_size=32, learning_rate=1e-3,
    seed=0)
pred = predict(model, variables, gnn_inputs,
               {k: v[te] for k, v in arrays.items()})

noisy_te = arrays["noisy"][te][:, :1]
print(f"ngem ensemble RMSE: noisy {rmse(noisy_te, y[te]):.4f} -> "
      f"mitigated {rmse(pred, y[te]):.4f}")

# --- deployment: Estimator whose results come back GNN-mitigated -------------
NgemEstimator = ngem(NoisyEstimator, model, dev, variables=variables,
                     pad_nodes=ds.max_nodes, pad_edges=ds.max_edges,
                     skip_transpile=True)
est = NgemEstimator(dev, shots=10000)
from mlqem_tpu.circuits.circuit import Circuit

qc = Circuit.from_dict(entries[0].circuit)
res = est.run(qc, single_z(0, 4)).result()
print("deployed ngem estimator:", float(res.values[0]),
      "| unmitigated:", res.metadata[0]["original_value"])
