"""Trajectory-based noisy Estimator: arbitrary circuits beyond dm widths.

The exact density-matrix backend (:class:`NoisyEstimator`) holds 4^n state —
practical to ~12 qubits. This backend estimates noisy expectation values
with Pauli-twirled trajectories on statevectors (2^n), extending the
Estimator-primitive API to ~24 qubits for arbitrary circuit batches, and
composing with ``zne()`` / ``learning()`` like any other backend.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.circuit import Circuit, stack_circuits
from ..circuits.observables import PauliTerm
from ..device.model import DeviceModel
from ..device.noise import NoiseModel
from ..ops.density import apply_readout_confusion
from ..ops.sampling import sampled_parity_expectation
from ..ops.trajectory import (_batch_trajectories, twirled_noise_tables)
from ..ops.unitaries import popcount
from ..utils.rng import prng_key
from .estimator import (BaseEstimator, EstimatorResult, Job,
                        _basis_rotation_circuit, _normalize_run_args)


class TrajectoryEstimator(BaseEstimator):
    """Noisy expectation values via Pauli-twirled trajectory sampling.

    Args:
        backend: DeviceModel (noise auto-built) or NoiseModel.
        n_traj: trajectories per circuit (noise realizations).
        shots: None → exact trajectory mean; int → adds sampled shot noise.
        readout: include assignment error.
    """

    def __init__(self, backend: Union[DeviceModel, NoiseModel, None] = None,
                 n_traj: int = 64, shots: Optional[int] = None,
                 readout: bool = True, seed: int = 0):
        if isinstance(backend, DeviceModel):
            self.noise_model: Optional[NoiseModel] = \
                NoiseModel.from_device(backend)
        else:
            self.noise_model = backend
        self.n_traj = n_traj
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
        # basis-rotate each circuit per its terms: group (circuit, term)
        jobs = []      # (circuit_with_rotation, z_support, coeff, out_idx)
        for i, (qc, obs) in enumerate(zip(circuits, observables)):
            for term in obs.terms:
                x_mask, z_mask = term.masks()
                rot = _basis_rotation_circuit(term, n)
                jobs.append((qc.compose(rot), int(x_mask | z_mask),
                             float(np.real(term.coeff)), i))
        ct = stack_circuits([j[0] for j in jobs])
        pauli_probs = twirled_noise_tables(ct, self.noise_model)
        B = ct.gate_ids.shape[0]
        keys = jax.random.split(self._next_key(), B)
        states = _batch_trajectories(
            jnp.asarray(ct.gate_ids), jnp.asarray(ct.qubits),
            jnp.asarray(ct.params), jnp.asarray(pauli_probs), keys,
            self.n_traj, n)                           # [B, T, dim]
        probs = jnp.real(states * jnp.conj(states))
        if self.readout and self.noise_model is not None \
                and self.noise_model.readout is not None:
            probs = apply_readout_confusion(
                probs, jnp.asarray(np.asarray(
                    self.noise_model.readout[:n], np.float32)), n)

        values = np.zeros(len(circuits), dtype=np.float64)
        dim = probs.shape[-1]
        j_idx = jnp.arange(dim, dtype=jnp.int32)
        for (qc_r, support, coeff, out_i), p in zip(jobs, probs):
            sign = 1 - 2 * (popcount(j_idx & jnp.int32(support)) & 1)
            if shots is None:
                per_traj = jnp.sum(p * sign, axis=-1)
                val = float(jnp.mean(per_traj))
            else:
                spt = max(1, int(shots) // self.n_traj)
                est = sampled_parity_expectation(
                    self._next_key(), p, spt, support)
                val = float(jnp.mean(est))
            values[out_i] += coeff * val
        meta = [{"simulator": "pauli_trajectory", "n_traj": self.n_traj,
                 "shots": shots} for _ in circuits]
        return Job(EstimatorResult(values, meta))
