"""Appendix tutorial a1 — the simulation engines.

Run: python docs/tutorials/a1_simulation_engines.py
(Add JAX_PLATFORMS=cpu for a quick CPU run.)
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

from mlqem_tpu import (Circuit, PauliSum, get_device, IdealEstimator,
                       NoisyEstimator, single_z)
from mlqem_tpu.circuits.families import (IsingModel, IsingOptions,
                                         generate_composed_clifford)
from mlqem_tpu.ops.stabilizer import StabilizerState

# --- exact statevector ------------------------------------------------------
bell = Circuit(2).h(0).cx(0, 1)
print("Bell <ZZ>:", IdealEstimator().run(bell, PauliSum("ZZ"))
      .result().values[0])

# --- density matrix under a real calibration noise model --------------------
dev = get_device("fake_lima")   # real ibmq_lima calibration snapshot
noisy = NoisyEstimator(dev, shots=10000)
print("noisy Bell <ZZ>:", noisy.run(bell, PauliSum("ZZ")).result().values[0])

# --- the TFIM Trotter family (the paper's workhorse) -------------------------
ops = IsingOptions.config_4q_paper()
qc = IsingModel.make_circs_sweep(ops, 3, "Z", measure=False)
for q in range(4):
    i = IdealEstimator().run(qc, single_z(q, 4)).result().values[0]
    n = noisy.run(qc, single_z(q, 4)).result().values[0]
    print(f"  q{q}: ideal {i:+.4f}  noisy {n:+.4f}")

# --- 100-qubit Clifford circuits on the stabilizer tableau -------------------
big = generate_composed_clifford(20, 5, 4, seed=1)   # 100 qubits
st = StabilizerState.from_circuit(big)
print("100q stabilizer <Z_0>:", st.expectation(single_z(0, 100)))
