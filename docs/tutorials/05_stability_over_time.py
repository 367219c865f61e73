"""Tutorial 05 — mitigation stability over calibration drift.

Mirrors the reference's ``05_stability_over_time.ipynb``: 120 real
ibmq_lima calibration snapshots (15 days, 3h cadence), the device-feature
drift table the notebook plots, and the punchline experiment — a model
trained at snapshot t=0 evaluated on a drifted device, then fine-tuned
back (h07–h09 transfer recipe).

Run: python docs/tutorials/05_stability_over_time.py   (~2 min CPU)
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

from mlqem_tpu import get_device
from mlqem_tpu.models.mlp import MLP1
from mlqem_tpu.models.train import train_mlp
from mlqem_tpu.workflows.datasets import ising_dataset
from mlqem_tpu.workflows.mitigate import encode_dataset
from mlqem_tpu.workflows.transfer import (calibration_drift,
                                          calibration_snapshots,
                                          device_at_time, finetune)

FAST = os.environ.get("MLQEM_TUT_FAST") == "1"
base = get_device("fake_lima")

# --- the drift table (the notebook's figure) ---------------------------------
drift = calibration_drift("ibmq_lima")
names = ["cx_err", "id_err", "sx_err", "x_err", "rz_err",
         "readout", "t1", "t2"]
print(f"{len(drift['times'])} snapshots "
      f"({drift['times'][0]} .. {drift['times'][-1]})")
print("relative drift (std/mean) per device stat:")
for n, r in zip(names, drift["drift_rel"]):
    print(f"  {n:8s} {r:7.4f}")

# --- train at t=0, evaluate at a drifted snapshot, fine-tune back ------------
snaps = calibration_snapshots("ibmq_lima")
dev_t0 = device_at_time(base, snaps, 0)
dev_t100 = device_at_time(base, snaps, 100)

n_circ = 40 if FAST else 100
ds_t0 = ising_dataset(dev_t0, num_circuits=n_circ, shots=None, seed=0)
X0, y0 = encode_dataset(ds_t0, dev_t0)
model = MLP1(hidden_size=32, output_size=4)
variables, _ = train_mlp(model, X0, y0, num_epochs=30 if FAST else 80,
                         batch_size=32, learning_rate=3e-3, seed=0)

ds_tr = ising_dataset(dev_t100, num_circuits=n_circ // 2, shots=None,
                      seed=1)
ds_te = ising_dataset(dev_t100, num_circuits=n_circ // 2, shots=None,
                      seed=2)
out = finetune(model, variables, ds_tr, dev_t100, ds_te,
               num_epochs=20 if FAST else 50, seed=0)
print(f"drifted device (t=100): zero-shot rmse {out['rmse_zero_shot']:.4f}"
      f" -> finetuned {out['rmse_finetuned']:.4f}"
      f" (noisy baseline {out['rmse_noisy']:.4f})")
