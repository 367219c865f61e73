"""Appendix tutorial a2 — 100-qubit noisy simulation + ZNE mimicry (demo1 at scale).

Sparse Pauli propagation makes the reference's hardware-only 100Q pipeline
fully simulable.
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

from mlqem_tpu.device.registry import configurable_device
from mlqem_tpu.ops.pauli_prop import PauliPropagatorIsing
from mlqem_tpu.workflows.demos import demo1_zne_mimic_100q

FAST = bool(_os.environ.get("MLQEM_TUT_FAST"))   # CI smoke scale
NQ, K = (40, 2048) if FAST else (100, 8192)
dev = configurable_device(NQ, seed=0)

# noisy 100Q TFIM <Z_q> directly
pp = PauliPropagatorIsing(dev, nq=NQ, steps=4, dt=0.5, h=0.66 * np.pi,
                          max_terms=K)
vals, disc = pp.generate(np.array([0.15], np.float32),
                         qubits=[0, NQ // 4, NQ // 2, 3 * NQ // 4, NQ - 1])
print(f"{NQ}Q noisy <Z>:", np.round(vals[0], 4),
      "| truncation weight:", np.round(disc[0].max(), 4))

# the full demo1 mimicry pipeline (reduced steps for tutorial runtime;
# the default engine is the exact light-cone statevector — deep runs at
# the published 10-step depth use it too, see docs/demos/)
out = demo1_zne_mimic_100q(device=dev, nq=NQ, num_steps=3)
print(f"demo1 ({out['engine']}): rmse noisy {out['rmse_noisy']:.4f} | "
      f"zne {out['rmse_zne']:.4f} | mimic {out['rmse_mimic']:.4f}")
