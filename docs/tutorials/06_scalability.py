"""Tutorial 06 — scalability: data generation from 5 to 400 qubits.

Mirrors the reference's ``06_scalability.ipynb`` sweep cell: composed
Clifford circuits at n ∈ {5, 20, 50, 100, 200, 400}, single-Z labels from
the stabilizer tableau engine, and the circuits/sec-vs-width timing table
the notebook plots.

Run: python docs/tutorials/06_scalability.py       (~2-4 min CPU)
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

from mlqem_tpu.workflows.transfer import scalability_sweep

FAST = os.environ.get("MLQEM_TUT_FAST") == "1"
widths = (5, 20, 50, 100) if FAST else (5, 20, 50, 100, 200, 400)
rows = scalability_sweep(qubit_counts=widths, depths=(1, 4, 7),
                         circuits_each=2 if FAST else 8)

print(f"{'n_qubits':>8} {'depth':>5} {'circuits/sec':>12}")
for r in rows:
    print(f"{r['n_qubits']:>8} {r['depth']:>5} "
          f"{r['circuits_per_sec']:>12.1f}")
widest = max(rows, key=lambda r: (r["n_qubits"], r["depth"]))
print(f"widest config: {widest['n_qubits']}q depth {widest['depth']} at "
      f"{widest['circuits_per_sec']:.1f} circuits/sec")
