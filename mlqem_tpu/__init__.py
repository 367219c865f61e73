"""mlqem_tpu — TPU-native machine-learning quantum error mitigation.

A from-scratch JAX/XLA framework with the capabilities of
qiskit-community/ml-qem ("blackwater", arXiv:2309.17368), redesigned
TPU-first: batched circuit simulation engines (statevector,
density-matrix with Aer-style channels, Pauli-twirled trajectories,
Pauli-frame kicked-Ising, stabilizer tableau, sparse Pauli propagation to
100Q+), reference-parity feature/graph encoders, a flax model zoo
(MLP/GNN/forest/linear), digital ZNE + Pauli twirling, and the
``learning()``/``ngem()`` mitigation decorators over Estimator primitives.

Quick start::

    from mlqem_tpu import (Circuit, PauliSum, get_device,
                           IdealEstimator, NoisyEstimator, learning)

    dev = get_device("fake_lima")
    qc = Circuit(2).h(0).cx(0, 1)
    noisy = NoisyEstimator(dev).run(qc, PauliSum("ZZ")).result().values
"""

from .circuits.circuit import Circuit, CircuitTensor, stack_circuits, tensorize
from .circuits.families import (IsingModel, IsingOptions,
                                construct_mbl_circuit, random_circuit,
                                random_clifford_circuit, two_local_ansatz)
from .circuits.observables import PauliSum, all_z, random_pauli_sum, single_z
from .circuits.parameters import Parameter, bind_parameters, tensorize_template
from .device.model import DeviceModel
from .device.noise import NoiseModel, add_coherent_cx_noise
from .device.registry import configurable_device, get_device, list_devices
from .exceptions import MLQEMException
from .metrics import Problem, Trial, improvement_factor, rmse
from .mitigation.learning import (EmptyProcessor, FlaxModelProcessor,
                                  ModelProcessor, ZNEProcessor, learning)
from .mitigation.ngem import GNNProcessor, ngem
from .mitigation.twirling import sample_twirled_circuits, twirl_circuit
from .mitigation.zne import (LinearExtrapolator, PolynomialExtrapolator,
                             RichardsonExtrapolator, ZNEEstimator,
                             ZNEStrategy, zne)
from .primitives.estimator import (BaseEstimator, CountsBackend,
                                   EstimatorResult, IdealEstimator, Job,
                                   NoisyEstimator)
from .primitives.trajectory_estimator import TrajectoryEstimator

__version__ = "0.1.0"

__all__ = [
    "Circuit", "CircuitTensor", "stack_circuits", "tensorize",
    "IsingModel", "IsingOptions", "construct_mbl_circuit", "random_circuit",
    "random_clifford_circuit", "two_local_ansatz",
    "PauliSum", "all_z", "random_pauli_sum", "single_z",
    "Parameter", "bind_parameters", "tensorize_template",
    "DeviceModel", "NoiseModel", "add_coherent_cx_noise",
    "configurable_device", "get_device", "list_devices",
    "MLQEMException",
    "Problem", "Trial", "improvement_factor", "rmse",
    "EmptyProcessor", "FlaxModelProcessor", "ModelProcessor",
    "ZNEProcessor", "learning", "GNNProcessor", "ngem",
    "sample_twirled_circuits", "twirl_circuit",
    "LinearExtrapolator", "PolynomialExtrapolator", "RichardsonExtrapolator",
    "ZNEEstimator", "ZNEStrategy", "zne",
    "BaseEstimator", "CountsBackend", "EstimatorResult", "IdealEstimator",
    "Job", "NoisyEstimator", "TrajectoryEstimator",
]
