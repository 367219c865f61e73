"""Tutorial 02 — labeled dataset generation.

Mirrors the reference's ``02_data_generation.ipynb``: ExpValueEntry graph
datasets (JSON round-trip compatible), the Ising workhorse under the three
noise settings, the compiled high-throughput label pipeline, and MBL data.

The data engine replaces the reference's per-circuit Aer calls inside a
multiprocessing pool with batched TPU programs.
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
from mlqem_tpu.data.generators import generate_exp_val_dataset
from mlqem_tpu.data.loaders import ExpValDataset, save_entries_json
from mlqem_tpu.parallel.datagen import IsingLabelPipeline
from mlqem_tpu.workflows.datasets import ising_dataset, mbl_dataset

FAST = os.environ.get("MLQEM_TUT_FAST") == "1"
dev = get_device("fake_lima")

# random-circuit graph entries (JSON round-trips with reference datasets)
entries = generate_exp_val_dataset(dev, n_qubits=4, circuit_depth=3,
                                   num_entries=10 if FAST else 20, seed=0)
save_entries_json(entries, "/tmp/entries.json")
ds = ExpValDataset("/tmp/entries.json")
print("graph dataset arrays:", {k: v.shape for k, v in ds.arrays.items()})

# the workhorse: Ising Trotter datasets under three noise settings
for noise in ("device", "coherent", "no_readout"):
    d = ising_dataset(dev, num_circuits=10 if FAST else 20,
                      noise=noise, shots=10000,
                      seed=1)
    err = float(np.sqrt(np.mean((d.noisy - d.ideal) ** 2)))
    print(f"ising[{noise}]: rmse(noisy, ideal) = {err:.4f}")

# high-throughput template pipeline (one compiled program; the bench path)
pipe = IsingLabelPipeline(dev, nq=4, steps=3, dt=0.5, shots=10000,
                          method="trajectory", n_traj=64)
ideal, noisy = pipe.generate(np.linspace(0.1, 0.5, 32), seed=0)
print("pipeline labels:", ideal.shape, noisy.shape)

# MBL Floquet with charge-imbalance targets
mbl = mbl_dataset(dev, num_qubits=4, num_circuits=4 if FAST else 10,
                  shots=None, seed=2)
print("mbl ideal[0]:", np.round(mbl.ideal[0], 3))
