"""MLP debug workflow (reference T11: docs/tutorials/obselete/mlp_debug.py).

The reference keeps an older MLP-on-MBL debug script around for inspecting
WHY a mitigation model trains badly: loss curves on a log axis, the
exp-value distribution of ideal/noisy/predicted, and a per-depth RMSE
breakdown (mlp_debug.py:165-365). Same capability here on the tpu-native
stack: `mbl_dataset` generates the 4q MBL circuits (theta = 0.05pi, the
reference's dataset2 setting), `encode_data` produces the 58-dim flat
features, and MLP1(128) trains with the shared harness. Diagnostic figures
are written next to --out (default: a temp dir) instead of plt.show().
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..")))
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from mlqem_tpu.device.registry import get_device
from mlqem_tpu.models.mlp import MLP1
from mlqem_tpu.models.train import mlp_inputs, predict, train_mlp
from mlqem_tpu.workflows.datasets import mbl_dataset
from mlqem_tpu.workflows.mitigate import encode_dataset

FAST = os.environ.get("MLQEM_TUT_FAST") == "1"

ap = argparse.ArgumentParser()
ap.add_argument("--out", default=None, help="directory for debug figures")
# parse_known_args: the smoke test runs this file under pytest's argv
args = ap.parse_known_args()[0]
out_dir = args.out or tempfile.mkdtemp(prefix="mlp_debug_")

dev = get_device("fake_lima")
nq = 4
# the reference's depth sweep (range(0, 10, 2)) becomes steps 1..5; FAST
# trims circuits and epochs, not the shape of the diagnostics. At the
# full default (500x30, measured: 0.0601 -> 0.0337) the MLP beats noisy;
# the FAST scale deliberately underfits — which is exactly the situation
# these diagnostics exist to inspect (depth-resolved degradation)
train_ds = mbl_dataset(dev, num_qubits=nq, theta=0.05 * np.pi,
                       num_circuits=60 if FAST else 500,
                       steps_range=(1, 5), seed=0)
test_ds = mbl_dataset(dev, num_qubits=nq, theta=0.05 * np.pi,
                      num_circuits=30 if FAST else 100,
                      steps_range=(1, 5), seed=1)
X_train, y_train = encode_dataset(train_ds, dev)
X_test, y_test = encode_dataset(test_ds, dev)
print(f"features: {X_train.shape} (58-dim reference format)")

model = MLP1(hidden_size=128, output_size=nq)
variables, history = train_mlp(model, X_train, y_train,
                               num_epochs=20 if FAST else 30,
                               batch_size=32, seed=0)
pred = predict(model, variables, mlp_inputs,
               {"X": np.asarray(X_test, np.float32)})
y_test = np.asarray(y_test, np.float32)
noisy = np.asarray(test_ds.noisy, np.float32)

rmse_noisy = float(np.sqrt(np.mean((noisy - y_test) ** 2)))
rmse_mit = float(np.sqrt(np.mean((pred - y_test) ** 2)))
print(f"test RMSE: noisy {rmse_noisy:.4f} -> mitigated {rmse_mit:.4f}")

# -- the debug diagnostics the reference script exists for -------------------
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, ax = plt.subplots(figsize=(5, 3.2))
ax.plot(history["train_loss"], label="train_loss")
ax.plot(history["val_loss"], label="val_loss")
ax.set_yscale("log")
ax.set_xlabel("epoch"), ax.set_ylabel("MSE"), ax.legend()
fig.savefig(os.path.join(out_dir, "loss_curves.png"),
            bbox_inches="tight")

fig, ax = plt.subplots(figsize=(5, 3.2))
ax.hist([y_test.ravel(), noisy.ravel(), pred.ravel()], bins=30,
        label=["ideal", "noisy", "mitigated"])
ax.set_title("Exp values distribution"), ax.legend()
fig.savefig(os.path.join(out_dir, "exp_value_distribution.png"),
            bbox_inches="tight")

steps = np.asarray([m["steps"] for m in test_ds.meta])
print("per-depth test RMSE (noisy -> mitigated):")
for s in sorted(set(steps.tolist())):
    sel = steps == s
    rn = float(np.sqrt(np.mean((noisy[sel] - y_test[sel]) ** 2)))
    rm = float(np.sqrt(np.mean((pred[sel] - y_test[sel]) ** 2)))
    print(f"  steps={s}: {rn:.4f} -> {rm:.4f}")
print(f"debug figures written to {out_dir}")
