"""Tutorial 03 — experiments on the lima backend (model zoo + deployment).

Mirrors the reference's ``03_experiments_on_lima_backend.ipynb``: an Ising
dataset under the real ibmq_lima calibration noise, the four-model
comparison table (OLS / RF / MLP / GNN — the notebook's figure), the
digital-ZNE baseline with RF mimicry, and deployment of the best model
behind the Estimator primitive via ``learning()``.

Run: python docs/tutorials/03_experiments_on_lima_backend.py  (~3 min CPU)
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

from mlqem_tpu import (ModelProcessor, NoisyEstimator, get_device, learning,
                       single_z)
from mlqem_tpu.models.forest import RandomForestRegressor
from mlqem_tpu.workflows.datasets import ising_dataset
from mlqem_tpu.workflows.mitigate import (model_comparison,
                                          train_mitigation_model, zne_batch,
                                          train_zne_mimic)

FAST = os.environ.get("MLQEM_TUT_FAST") == "1"
dev = get_device("fake_lima")
ds = ising_dataset(dev, num_circuits=24 if FAST else 80, shots=10000,
                   seed=0)

# model zoo comparison (h10/h12/h15/h17/h34 shape, all four arms)
table = model_comparison(ds, dev, seed=0, mlp_epochs=30 if FAST else 80,
                         gnn_epochs=30 if FAST else 400)
for name, row in table.items():
    print(f"{name:14s} rmse: noisy {row['rmse_noisy']:.4f} -> "
          f"mitigated {row['rmse_mitigated']:.4f}")

# digital ZNE baseline + mimicry (h16/h19 shape)
zne_vals = zne_batch(ds, dev, shots=10000, seed=1)
mimic = train_zne_mimic(RandomForestRegressor(100, random_state=0), ds,
                        dev, zne_values=zne_vals, seed=0)
print("mimic vs zne rmse:", round(mimic["rmse_mimic_vs_zne"], 4))

# deploy the best model behind the Estimator primitive
best = table["random_forest"]["model"]
est = learning(NoisyEstimator, ModelProcessor(best, dev,
                                              skip_transpile=True),
               skip_transpile=True)(dev, shots=10000)
qc = ds.circuits[0]
res = est.run(qc, single_z(0, 4)).result()
print("mitigated:", res.values[0], "| original:",
      res.metadata[0]["original_value"])
