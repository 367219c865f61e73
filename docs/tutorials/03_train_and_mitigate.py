"""Tutorial 03 — train mitigation models and deploy behind the Estimator.

The product's core loop: dataset → model → learning() decorator → RMSE win.
"""
import numpy as np

from mlqem_tpu import (ModelProcessor, NoisyEstimator, get_device, learning,
                       single_z)
from mlqem_tpu.models.forest import RandomForestRegressor
from mlqem_tpu.workflows.datasets import ising_dataset
from mlqem_tpu.workflows.mitigate import (model_comparison,
                                          train_mitigation_model, zne_batch,
                                          train_zne_mimic)

dev = get_device("fake_lima")
ds = ising_dataset(dev, num_circuits=80, shots=10000, seed=0)

# model zoo comparison (h10/h12/h15 shape)
table = model_comparison(ds, dev, seed=0, mlp_epochs=80)
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
