"""Estimator primitives: the framework's execution API.

Mirrors the qiskit Estimator-primitive surface the reference builds on —
``estimator.run(circuits, observables, parameter_values) → job`` with
``job.result().values`` — so the learning/ngem mitigation decorators
(``blackwater/library/learning/estimator.py:262-328``) compose identically.

Backends:
* :class:`IdealEstimator` — exact statevector expectation values (replaces
  ``AerEstimator()`` ideal labels, ``data/utils.py:422-424``).
* :class:`NoisyEstimator` — density-matrix + device noise model + optional
  shot sampling + readout error (replaces ``BackendEstimator`` /
  ``AerSimulator.from_backend``, ``data/utils.py:426-430``).
"""
from __future__ import annotations

import dataclasses
import uuid
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.circuit import Circuit, stack_circuits
from ..circuits.observables import PauliSum, PauliTerm
from ..circuits.parameters import bind_parameters, circuit_parameters
from ..device.model import DeviceModel
from ..device.noise import NoiseModel, compile_noise_table
from ..ops.density import (apply_readout_confusion, batch_density_matrices,
                           batch_density_matrices_from, dm_probabilities,
                           expval_pauli_sum_dm)
from ..ops.sampling import sample_outcomes
from ..ops.statevector import batch_statevectors, expval_pauli_sum
from ..utils.rng import prng_key


@dataclasses.dataclass
class EstimatorResult:
    """values[i] = ⟨observables[i]⟩ for circuits[i]; metadata per item."""

    values: np.ndarray
    metadata: List[dict]


class Job:
    """Synchronous job wrapper (parity with the JobV1 surface the
    reference's ``PostProcessedJob`` wraps, ``learning/estimator.py:197``)."""

    def __init__(self, result: EstimatorResult, job_id: Optional[str] = None):
        self._result = result
        self._job_id = job_id or str(uuid.uuid4())

    def result(self) -> EstimatorResult:
        return self._result

    def job_id(self) -> str:
        return self._job_id

    def status(self) -> str:
        return "DONE"

    def cancel(self):
        return None


def _normalize_run_args(circuits, observables, parameter_values):
    if isinstance(circuits, Circuit):
        circuits = [circuits]
    if isinstance(observables, (PauliSum, str)):
        observables = [observables] * len(circuits)
    observables = [PauliSum(o) if isinstance(o, str) else o
                   for o in observables]
    if parameter_values is None:
        parameter_values = [()] * len(circuits)
    elif parameter_values and np.isscalar(parameter_values[0]):
        parameter_values = [parameter_values]
    if not (len(circuits) == len(observables) == len(parameter_values)):
        raise ValueError(
            f"length mismatch: {len(circuits)} circuits, "
            f"{len(observables)} observables, "
            f"{len(parameter_values)} parameter sets")
    bound = []
    for qc, pv, obs in zip(circuits, parameter_values, observables):
        if obs.num_qubits != qc.num_qubits:
            raise ValueError(
                f"observable width {obs.num_qubits} != circuit width "
                f"{qc.num_qubits}")
        if circuit_parameters(qc):
            qc = bind_parameters(qc, list(pv))
        bound.append(qc)
    return bound, observables


class BaseEstimator:
    """Estimator base: ``run`` normalizes, ``_run`` computes (patch point)."""

    def run(self, circuits, observables, parameter_values=None,
            **run_options) -> Job:
        return self._run(circuits, observables, parameter_values,
                         **run_options)

    def _run(self, circuits, observables, parameter_values=None,
             **run_options) -> Job:
        raise NotImplementedError


class IdealEstimator(BaseEstimator):
    """Exact expectation values from the batched statevector engine."""

    def _run(self, circuits, observables, parameter_values=None,
             **run_options) -> Job:
        circuits, observables = _normalize_run_args(
            circuits, observables, parameter_values)
        ct = stack_circuits(circuits)
        states = batch_statevectors(ct)
        values = np.empty(len(circuits), dtype=np.float64)
        for i, obs in enumerate(observables):
            values[i] = float(expval_pauli_sum(states[i], obs))
        meta = [{"simulator": "statevector", "shots": None}
                for _ in circuits]
        return Job(EstimatorResult(values, meta))


def _basis_rotation_circuit(term: PauliTerm, num_qubits: int) -> Circuit:
    """Append-able rotation mapping the term's eigenbasis to Z."""
    rot = Circuit(num_qubits)
    for q, code in enumerate(term.codes()):
        if code == 1:      # X → H
            rot.h(q)
        elif code == 2:    # Y → Sdg, H
            rot.sdg(q).h(q)
    return rot


def _measurement_groups(terms: Sequence[PauliTerm]
                        ) -> List[Tuple[List[int], List[PauliTerm]]]:
    """Greedy qubit-wise grouping of terms into shared measurement bases.

    Two terms share a basis when every qubit on which both act non-trivially
    carries the same Pauli (qubit-wise commuting, the same criterion the
    reference's BackendEstimator uses via ``abelian_grouping``). Returns
    ``(basis, terms)`` pairs where ``basis[q] ∈ {0:free/Z, 1:X, 2:Y, 3:Z}``.
    """
    groups: List[Tuple[List[int], List[PauliTerm]]] = []
    for term in terms:
        codes = term.codes()
        placed = False
        for basis, members in groups:
            if all(c == 0 or basis[q] in (0, int(c))
                   for q, c in enumerate(codes)):
                for q, c in enumerate(codes):
                    if c != 0:
                        basis[q] = int(c)
                members.append(term)
                placed = True
                break
        if not placed:
            groups.append(([int(c) for c in codes], [term]))
    return groups


def _rotation_from_basis(basis: Sequence[int], num_qubits: int) -> Circuit:
    """Rotation circuit mapping the group's eigenbasis to Z (free/Z → id)."""
    rot = Circuit(num_qubits)
    for q, code in enumerate(basis):
        if code == 1:      # X → H
            rot.h(q)
        elif code == 2:    # Y → Sdg, H
            rot.sdg(q).h(q)
    return rot


class NoisyEstimator(BaseEstimator):
    """Density-matrix simulation under a device noise model.

    Args:
        backend: a DeviceModel (noise auto-built Aer-style) or a NoiseModel.
        shots: None → exact expectation of the noisy state; int → sampled.
        readout: include readout (assignment) error in measurement.
        seed: PRNG seed for shot sampling.
    """

    def __init__(self, backend: Union[DeviceModel, NoiseModel, None] = None,
                 shots: Optional[int] = None, readout: bool = True,
                 seed: int = 0):
        if isinstance(backend, DeviceModel):
            self.noise_model: Optional[NoiseModel] = \
                NoiseModel.from_device(backend)
            self.device: Optional[DeviceModel] = backend
        else:
            self.noise_model = backend
            self.device = None
        self.shots = shots
        self.readout = readout
        self._key = prng_key(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _run(self, circuits, observables, parameter_values=None,
             **run_options) -> Job:
        shots = run_options.get("shots", self.shots)
        circuits, observables = _normalize_run_args(
            circuits, observables, parameter_values)
        n = circuits[0].num_qubits
        ct = stack_circuits(circuits)
        keys, table = compile_noise_table(ct, self.noise_model)
        dms = batch_density_matrices(ct, keys, table)

        confusion = None
        if self.readout and self.noise_model is not None \
                and self.noise_model.readout is not None:
            confusion = jnp.asarray(
                np.asarray(self.noise_model.readout[:n], np.float32))

        exact = shots is None and confusion is None
        values = np.zeros(len(circuits), dtype=np.float64)
        # one measurement job per (circuit, qubit-wise-commuting basis group);
        # all rotation evolutions then run as a single batched jit call
        jobs: List[Tuple[int, Circuit, List[Tuple[float, int]]]] = []
        for i, obs in enumerate(observables):
            terms = list(obs.terms)
            if exact:
                # diagonal terms read the dm diagonal exactly; only X/Y
                # terms need a (noisy) basis rotation + measurement
                diag = [t for t in terms if t.masks()[0] == 0]
                terms = [t for t in terms if t.masks()[0] != 0]
                if diag:
                    values[i] += float(np.real(
                        expval_pauli_sum_dm(dms[i], PauliSum(diag))))
            for basis, members in _measurement_groups(terms):
                entries = [(float(np.real(t.coeff)),
                            t.masks()[0] | t.masks()[1]) for t in members]
                jobs.append((i, _rotation_from_basis(basis, n), entries))

        if jobs:
            rot_ct = stack_circuits([rot for _, rot, _ in jobs])
            rkeys, rtable = compile_noise_table(rot_ct, self.noise_model)
            dm0 = dms[np.asarray([i for i, _, _ in jobs])]
            probs = dm_probabilities(
                batch_density_matrices_from(rot_ct, rkeys, rtable, dm0))
            if confusion is not None:
                probs = apply_readout_confusion(probs, confusion, n)
            if shots is None:
                pr = np.asarray(probs, np.float64)
                idx = np.arange(pr.shape[-1], dtype=np.int64)
                for (i, _, entries), p in zip(jobs, pr):
                    for coeff, support in entries:
                        sign = 1.0 - 2.0 * (
                            np.bitwise_count(idx & support) & 1)
                        values[i] += coeff * float(p @ sign)
            else:
                # one shot table per basis group, shared by its terms —
                # hardware measurement semantics (and one sampling call)
                outs = np.asarray(sample_outcomes(
                    self._next_key(), probs, int(shots)), np.int64)
                for (i, _, entries), o in zip(jobs, outs):
                    for coeff, support in entries:
                        par = np.bitwise_count(o & support) & 1
                        values[i] += coeff * (1.0 - 2.0 * float(np.mean(par)))
        meta = [{"simulator": "density_matrix", "shots": shots,
                 "readout": confusion is not None} for _ in circuits]
        return Job(EstimatorResult(values, meta))


class CountsBackend:
    """Counts-dict execution surface (``execute → get_counts`` parity).

    Circuits are executed under the noise model; outcomes include readout
    error; counts use qiskit bitstring format (leftmost = highest qubit).
    """

    def __init__(self, backend: Union[DeviceModel, NoiseModel, None] = None,
                 seed: int = 0):
        if isinstance(backend, DeviceModel):
            self.noise_model: Optional[NoiseModel] = \
                NoiseModel.from_device(backend)
        else:
            self.noise_model = backend
        self._key = prng_key(seed)

    def run_probs(self, circuits: Sequence[Circuit]) -> np.ndarray:
        """Measurement distributions after noise + readout: [B, 2**n]."""
        n = circuits[0].num_qubits
        ct = stack_circuits(list(circuits))
        keys, table = compile_noise_table(ct, self.noise_model)
        dms = batch_density_matrices(ct, keys, table)
        probs = dm_probabilities(dms)
        if self.noise_model is not None and self.noise_model.readout is not None:
            probs = apply_readout_confusion(
                probs,
                jnp.asarray(np.asarray(self.noise_model.readout[:n],
                                       np.float32)), n)
        dim = 2 ** n
        return np.asarray(probs)[:, :dim]

    def run_counts(self, circuits: Sequence[Circuit], shots: int = 10000
                   ) -> List[Dict[str, int]]:
        from ..ops.sampling import histogram_to_counts, sample_histogram

        n = circuits[0].num_qubits
        probs = jnp.asarray(self.run_probs(circuits))
        self._key, sub = jax.random.split(self._key)
        hists = np.asarray(sample_histogram(sub, probs, shots, 2 ** n))
        return [histogram_to_counts(h, n) for h in hists]
