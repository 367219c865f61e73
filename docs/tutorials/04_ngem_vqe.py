"""Tutorial 04 — VQE with learned mitigation.

Mirrors the reference's ``04_ngem_vqe.ipynb`` / h20-h21: train a
mitigation processor on VQE-ansatz data, then run the H2 dissociation
energy with ideal / noisy / mitigated arms — the printed energy errors are
the notebook's metric.

Run: python docs/tutorials/04_ngem_vqe.py           (~3 min CPU)
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
from mlqem_tpu.apps.chemistry import load_h2_problems
from mlqem_tpu.workflows.vqe_study import (train_vqe_processor, vqe_dataset,
                                           vqe_mitigation_study)

FAST = os.environ.get("MLQEM_TUT_FAST") == "1"
dev = get_device("fake_lima")
data = vqe_dataset(dev, samples_per_pauli=20 if FAST else 60, shots=10000,
                   seed=0)
processor, stats = train_vqe_processor(dev, data)
print("processor training:", stats)

length, fci, ham = load_h2_problems()[4]   # near-equilibrium H2
out = vqe_mitigation_study(dev, ham, processor,
                           maxiter=20 if FAST else 60, shots=10000)
print(f"H2 @ {length} A: exact {out['exact']:.5f}")
for arm in ("ideal", "noisy", "mitigated"):
    print(f"  {arm:9s}: {out[arm]:.5f}")
print(f"error: noisy {out['error_noisy']:.5f} -> "
      f"mitigated {out['error_mitigated']:.5f}")
