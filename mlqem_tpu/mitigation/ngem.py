"""NGEM: graph-neural mitigation behind the Estimator primitive.

Parity with ``blackwater/library/ngem/estimator.py``: for each noisy
expectation value, the bound circuit is graph-encoded (qubit + gate
calibration features on), packed into the :class:`ExpValueEntry` array form,
and the GNN maps (noisy value, observable, depth, graph) → mitigated value
(``NgemJob``, ref :23-98; ``ngem()`` decorator, ref :137-158).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Type

import jax.numpy as jnp
import numpy as np

from ..circuits.circuit import Circuit
from ..circuits.observables import PauliSum
from ..circuits.parameters import bind_parameters, circuit_parameters
from ..data.encoders import encode_pauli_sum_op
from ..data.generators import ExpValueEntry
from ..data.graph import circuit_to_graph_data_json
from ..device.model import DeviceModel
from ..exceptions import MLQEMException
from ..primitives.estimator import BaseEstimator, EstimatorResult, Job
from ..transpile.lower import transpile
from .learning import patch_run


class GNNProcessor:
    """Wrap a flax GNN (+ variables) as a mitigation processor.

    ``pad_nodes``/``pad_edges`` fix the padded graph shape so repeated calls
    reuse one compiled forward (set them to the training-time padding).
    """

    def __init__(self, model, variables, backend: DeviceModel,
                 pad_nodes: int = 64, pad_edges: int = 160,
                 skip_transpile: bool = False):
        self._model = model
        self._variables = variables
        self._backend = backend
        self._properties = backend.properties()
        self._pad_nodes = pad_nodes
        self._pad_edges = pad_edges
        self._skip_transpile = skip_transpile

    def process(self, expectation_value, circuits, observables,
                parameter_values):
        from ..models.gnn import edge_index_to_adj

        circuit: Circuit = circuits
        if not self._skip_transpile:
            circuit = transpile(circuit, basis=self._backend.basis_gates)
        graph = circuit_to_graph_data_json(
            circuit, self._properties, use_gate_features=True,
            use_qubit_features=True)
        entry = ExpValueEntry(
            circuit_graph=graph,
            observable=encode_pauli_sum_op(observables),
            ideal_exp_value=0.0,
            noisy_exp_values=[float(expectation_value)],
            circuit_depth=circuit.depth(),
        )
        arrays = entry.to_arrays(self._pad_nodes, self._pad_edges)
        batch = {k: np.asarray(v)[None] for k, v in arrays.items()}
        adj = edge_index_to_adj(jnp.asarray(batch["edge_index"]),
                                jnp.asarray(batch["edge_mask"]),
                                self._pad_nodes)
        out = self._model.apply(
            self._variables, jnp.asarray(batch["noisy"]),
            jnp.asarray(batch["observable"]),
            jnp.asarray(batch["circuit_depth"]),
            jnp.asarray(batch["x"]), adj,
            jnp.asarray(batch["node_mask"]), train=False)
        return float(np.asarray(out).reshape(-1)[0])


def ngem(cls: Type[BaseEstimator], model: Any, backend: DeviceModel,
         variables=None, skip_transpile: bool = False,
         pad_nodes: int = 64, pad_edges: int = 160):
    """Decorator parity with ``ngem(EstimatorCls, model, backend, options)``
    (ref :137-158): returns ``Ngem<cls>`` whose results are GNN-mitigated.

    ``model`` may be a ready processor (has ``process``) or a flax module
    with its trained ``variables``.
    """
    if hasattr(model, "process"):
        processor = model
    else:
        processor = GNNProcessor(model, variables, backend,
                                 pad_nodes=pad_nodes, pad_edges=pad_edges,
                                 skip_transpile=skip_transpile)
    new_class: type = type(f"Ngem{cls.__name__}", (cls,), {})
    new_class._run = patch_run(new_class._run, processor,
                               skip_transpile=True, backend=backend)
    return new_class
