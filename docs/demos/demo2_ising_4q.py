"""Demo 2 — RF mitigation on the 4Q TFIM Trotter step sweep.

Reproduction of ``demo2_ising_4q_hardware_plot.ipynb`` with simulated
fake_lima data (reference hardware numbers: noisy 0.117 → mitigated 0.075).

Run: python docs/demos/demo2_ising_4q.py   (~2-4 min on CPU)
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run from a source checkout
if _os.environ.get("JAX_PLATFORMS"):   # honored even where jax is
    import jax as _jax                 # pre-imported at startup
    _jax.config.update("jax_platforms",
                       _os.environ["JAX_PLATFORMS"])

import numpy as np

from mlqem_tpu.workflows.demos import demo2_ising_4q


def main():
    out = demo2_ising_4q(num_steps=10, num_train=150, shots=10000, seed=0)
    print(f"RMSE noisy     : {out['rmse_noisy']:.5f}")
    print(f"RMSE mitigated : {out['rmse_mitigated']:.5f}")
    print("per-qubit noisy    :", np.round(out["rmse_per_qubit_noisy"], 4))
    print("per-qubit mitigated:",
          np.round(out["rmse_per_qubit_mitigated"], 4))
    print("L2 vs ideal per step (noisy)    :",
          np.round(out["l2_per_step_noisy"], 4))
    print("L2 vs ideal per step (mitigated):",
          np.round(out["l2_per_step_mitigated"], 4))


if __name__ == "__main__":
    main()
