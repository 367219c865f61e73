"""Appendix tutorial a3 — multi-chip sharding.

Run on CPU with a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python docs/tutorials/a3_multichip_sharding.py
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run from a source checkout
if _os.environ.get("JAX_PLATFORMS"):   # honored even where jax is
    import jax as _jax                 # pre-imported at startup
    _jax.config.update("jax_platforms",
                       _os.environ["JAX_PLATFORMS"])

import jax
import numpy as np

from mlqem_tpu.circuits.circuit import tensorize
from mlqem_tpu.circuits.families import IsingModel, IsingOptions
from mlqem_tpu.device.registry import get_device
from mlqem_tpu.ops.sharded_sv import (sharded_statevector_fn,
                                      sharded_z_expectations)
from mlqem_tpu.parallel.datagen import IsingLabelPipeline
from mlqem_tpu.parallel.mesh import make_mesh

print("devices:", jax.devices())

# data-parallel label generation: the batch axis rides the mesh
mesh = make_mesh()
dev = get_device("fake_lima")
pipe = IsingLabelPipeline(dev, nq=4, steps=2, dt=0.5, shots=10000)
ideal, noisy = pipe.generate(np.linspace(0.1, 0.5, 32), seed=0, mesh=mesh)
print("dp-sharded labels:", ideal.shape)

# amplitude-sharded statevector: the 2^n state spans devices (ppermute)
sp_mesh = make_mesh(dp=len(jax.devices()) // 4, sp=4)
ops = IsingOptions(nq=6, h=1.0, J=0.3, dt=0.5, depth=2)
qc = IsingModel.make_circuit(ops, measure=False)
fn = sharded_statevector_fn(qc, sp_mesh)
psi = fn(tensorize(qc).params)
print("sharded <Z_q>:", np.round(
    sharded_z_expectations(psi, 6, sp_mesh), 4))
