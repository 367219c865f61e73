"""Tutorial 07 — generalization: interpolation vs extrapolation.

Mirrors the reference's ``07_generalization.ipynb``: train a mitigation
model on MBL circuits at disorder strengths θ ∈ {0.05π, 0.15π}, then test
at an interior θ = 0.10π (interpolation) and an exterior θ = 0.30π
(extrapolation). The printed generalization gap is the notebook's metric.

Run: python docs/tutorials/07_generalization.py     (~2 min CPU)
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

from mlqem_tpu import get_device
from mlqem_tpu.workflows.generalization import generalization_study

FAST = os.environ.get("MLQEM_TUT_FAST") == "1"
dev = get_device("fake_lima")

out = generalization_study(dev, num_qubits=4,
                           per_config=6 if FAST else 12, shots=None,
                           seed=0)

for split in ("interpolation", "extrapolation"):
    row = out[split]
    print(f"{split:14s} θ={row['theta_pi']}π: "
          f"noisy {row['rmse_noisy']:.4f} -> "
          f"mitigated {row['rmse_mitigated']:.4f}")
gap = (out["extrapolation"]["rmse_mitigated"]
       - out["interpolation"]["rmse_mitigated"])
print(f"generalization gap (extrap - interp): {gap:+.4f}")
