"""Device-mesh utilities: the framework's parallelism layer.

The reference's only parallelism is a ``multiprocessing.Pool`` fan-out over
circuits (``zne_parallel.py:269-271``, ``vqe_data_gen_parallel.py:100-126``
— SURVEY §2.4). The TPU-native equivalent: one SPMD program with the
circuit batch sharded over the mesh's data axis (ICI), and — for large
statevectors — amplitudes sharded over a second axis (the context-parallel
analog), with XLA inserting the collectives.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, sp: int = 1,
              devices=None) -> Mesh:
    """Create a (dp=data/circuit-batch, sp=state/amplitude) mesh.

    Defaults to all visible devices on the dp axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp * sp} != {n} devices")
    dev_array = np.asarray(devices).reshape(dp, sp)
    return Mesh(dev_array, axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (circuit-batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_circuit_batch(ct, mesh: Mesh):
    """Place a CircuitTensor's batched arrays with the batch axis on dp."""
    import jax.numpy as jnp

    from ..circuits.circuit import CircuitTensor

    sh = batch_sharding(mesh)
    return CircuitTensor(
        jax.device_put(jnp.asarray(ct.gate_ids), sh),
        jax.device_put(jnp.asarray(ct.qubits), sh),
        jax.device_put(jnp.asarray(ct.params), sh),
        ct.num_qubits,
    )


def pad_to_multiple(arrays: Dict[str, np.ndarray], multiple: int
                    ) -> Tuple[Dict[str, np.ndarray], int]:
    """Pad a batch's leading dim up to a device-count multiple.

    Returns (padded arrays, original size) — SPMD sharding needs the batch
    divisible by dp.
    """
    n = next(iter(arrays.values())).shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return arrays, n
    out = {}
    for k, v in arrays.items():
        pad_width = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad_width, mode="edge")
    return out, n
