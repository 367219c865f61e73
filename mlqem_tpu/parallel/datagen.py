"""Sharded, jit-once dataset generation — the framework's throughput path.

The BASELINE target (≥100k noisy 10Q training pairs/min on v5e-8) is hit by
exploiting shared circuit topology: a parameterized family (Ising Trotter,
MBL, ansatz sweeps) tensorizes ONCE into a template, parameter batches bind
inside jit, and the whole (ideal statevector + noisy density-matrix +
readout + shot-sampling) label pipeline is one compiled SPMD program with
the batch axis sharded over the mesh (ICI). Compare the reference: one
qiskit transpile + two Aer process calls per circuit inside
``multiprocessing.Pool`` (``vqe_data_gen_parallel.py:100-126``).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.circuit import Circuit, CircuitTensor
from ..circuits.families import IsingModel, IsingOptions
from ..circuits.parameters import (CircuitTemplate, Parameter,
                                   tensorize_template)
from ..device.model import DeviceModel
from ..device.noise import NoiseModel, compile_noise_table
from ..ops.density import (apply_readout_confusion, dm_probabilities,
                           run_density)
from ..ops.sampling import sample_outcomes
from ..ops.statevector import (probabilities, statevector, z_expectations)
from .mesh import batch_sharding, make_mesh, replicated
from ..utils.rng import prng_key
from ..utils.platform import on_tpu as _on_tpu


def make_ising_template(nq: int, steps: int, basis: str = "Z",
                        dt: float = 0.25, h: Optional[float] = None
                        ) -> CircuitTemplate:
    """Parameterized TFIM Trotter template: J (and optionally h) symbolic."""
    J = Parameter("J")
    hp = Parameter("h") if h is None else h
    ops = IsingOptions(nq=nq, h=hp, J=J, dt=dt, depth=steps,
                       measure_basis=basis)
    qc = IsingModel.make_circuit(ops, measure=False)
    return tensorize_template(qc)


@dataclasses.dataclass
class IsingLabelPipeline:
    """Compiled (ideal, noisy) per-qubit-Z label generator for one template.

    One instance = one compiled program; call :meth:`generate` with
    parameter batches of a fixed size to avoid recompiles.
    """

    device: DeviceModel
    nq: int
    steps: int
    dt: float = 0.25
    h: Optional[float] = 1.0   # None → symbolic (pass h_values at generate)
    shots: Optional[int] = 10000
    readout: bool = True
    noise_model: Optional[NoiseModel] = None
    # 'density_matrix' = exact Aer-style channels; 'trajectory' = the
    # Pauli-twirled trajectory engine — on TPU it auto-dispatches to the
    # fused Pallas Pauli-frame kernel when the circuit is frame-supported
    # (887k pairs/min/chip vs the XLA gather engine's 59.6k, PERF.md r4);
    # 'trajectory_gather' pins the XLA gather engine (any gate set);
    # 'frame' forces the Pauli-frame variant (ops/frame_trajectory.py,
    # rotation+Clifford circuits only — errors if unsupported; on CPU it
    # is ~4x slower than the gather engine, so 'trajectory' keeps gather
    # off-TPU)
    method: str = "density_matrix"
    n_traj: int = 100

    def __post_init__(self):
        self.template = make_ising_template(self.nq, self.steps, "Z",
                                            self.dt, h=self.h)
        nm = self.noise_model
        if nm is None:
            nm = NoiseModel.from_device(self.device)
        self._nm = nm
        # shared topology → the noise keys are identical across the batch
        ct0 = self.template.bind_host(
            np.zeros(self.template.num_parameters, np.float32))
        keys, table = compile_noise_table(ct0, nm)
        # keep these as HOST numpy: they become jit constants, and the axon
        # platform cannot pull complex64 device buffers back for embedding
        self._keys = np.asarray(keys, np.int32)
        self._table = np.asarray(table, np.complex64)
        ro = nm.readout[:self.nq] if (self.readout and nm.readout is not None) \
            else None
        self._confusion = None if ro is None else np.asarray(ro, np.float32)
        if self.method in ("trajectory", "trajectory_gather", "frame"):
            from ..ops.frame_trajectory import frame_supported
            from ..ops.trajectory import twirled_noise_tables

            self._pauli_probs = twirled_noise_tables(ct0, nm)  # [L, 16]
            if self.method == "frame":
                if not frame_supported(ct0, self.nq):
                    raise ValueError(
                        "method='frame' needs rotations + Cliffords "
                        "(gate set {id,x,y,z,h,s,sdg,t,tdg,sx,sxdg,rx,ry,"
                        "rz,p,rzz,cx,cy,cz,swap}, <=30 qubits)")
            elif self.method == "trajectory" and _on_tpu() \
                    and frame_supported(ct0, self.nq):
                self.method = "frame"   # TPU: fused frame kernel wins 15x
        self._compiled = {}  # mesh (or None) -> jitted program

    def _build(self, mesh=None):
        template = self.template
        keys, table, confusion = self._keys, self._table, self._confusion
        nq, shots = self.nq, self.shots
        method, n_traj = self.method, self.n_traj
        use_frame = method == "frame"
        if method in ("trajectory", "trajectory_gather", "frame"):
            pauli_probs = self._pauli_probs
            shots_per_traj = None if shots is None else max(
                1, shots // n_traj)

        ct_struct = self.template.bind_host(
            np.zeros(self.template.num_parameters, np.float32))

        def labels(param_batch, sample_key):
            ct = template.bind(param_batch)          # params [B, L, 3]

            def one_ideal(params):
                cti = CircuitTensor(ct.gate_ids, ct.qubits, params, nq)
                psi = statevector(cti)
                return z_expectations(probabilities(psi), nq)

            ideal = jax.vmap(one_ideal)(ct.params)

            if method in ("trajectory", "trajectory_gather", "frame"):
                B = param_batch.shape[0]
                from ..ops.sampling import sample_small_categorical

                choice_key, shot_key = jax.random.split(sample_key)
                L = ct_struct.max_ops
                # [L, 16] rows broadcast over (B, n_traj, L) draws —
                # inverse-CDF avoids categorical's [B,T,L,16] gumbel buffer
                choices = sample_small_categorical(
                    choice_key, jnp.asarray(pauli_probs)[None, None],
                    (B, n_traj, L))
                if use_frame and _on_tpu():
                    from ..ops.frame_trajectory import \
                        run_frame_trajectories_z

                    # fused Pallas path: the state lives in the kernel's
                    # VMEM; only sign-folded angles in, per-qubit marginals
                    # (frame-corrected + confused) out
                    z_traj = run_frame_trajectories_z(
                        ct_struct, ct.params, choices, nq,
                        confusion=confusion)
                elif use_frame:
                    from ..ops.frame_trajectory import \
                        run_frame_trajectories_probs

                    # Pauli-frame engine: noise rides integer frame masks,
                    # state updates are shared rotations/permutations
                    probs = run_frame_trajectories_probs(
                        ct_struct, ct.params, choices, nq)
                    if confusion is not None:
                        probs = apply_readout_confusion(
                            probs, confusion, nq, variant="xor")
                    z_traj = z_expectations(probs, nq)
                else:
                    from ..ops.trajectory import \
                        run_trajectories_presampled

                    states = run_trajectories_presampled(
                        ct_struct, ct.params, choices, nq)
                    probs = jnp.real(states * jnp.conj(states))
                    if confusion is not None:
                        probs = apply_readout_confusion(
                            probs, confusion, nq, variant="einsum")
                    z_traj = z_expectations(probs, nq)    # [B, T, nq]
                if shots is None:
                    noisy = jnp.mean(z_traj, axis=1)
                else:
                    # per-qubit shot noise: the <Z_q> estimate from S joint
                    # samples is marginally Binomial(S, p1_q) — sample that
                    # directly instead of materializing outcome tensors
                    p1 = jnp.clip((1.0 - z_traj) / 2.0, 0.0, 1.0)
                    counts = jax.random.binomial(
                        shot_key, shots_per_traj, p1).astype(jnp.float32)
                    z_sampled = 1.0 - 2.0 * counts / shots_per_traj
                    noisy = jnp.mean(z_sampled, axis=1)
                return ideal, noisy

            from ..ops.density_static import run_density_static

            dms = run_density_static(ct_struct, ct.params, keys, table)
            probs = dm_probabilities(dms)
            if confusion is not None:
                probs = apply_readout_confusion(probs, confusion, nq)
            if shots is None:
                noisy = z_expectations(probs, nq)
            else:
                outcomes = sample_outcomes(sample_key, probs, shots)
                bits = []
                for q in range(nq):
                    b = (outcomes >> q) & 1
                    bits.append(1.0 - 2.0 * jnp.mean(
                        b.astype(jnp.float32), axis=-1))
                noisy = jnp.stack(bits, axis=-1)
            return ideal, noisy

        if mesh is None:
            return jax.jit(labels)
        in_shardings = (batch_sharding(mesh), replicated(mesh))
        out_shardings = (batch_sharding(mesh), batch_sharding(mesh))
        return jax.jit(labels, in_shardings=in_shardings,
                       out_shardings=out_shardings)

    def generate(self, J_values: np.ndarray, h_values: Optional[np.ndarray]
                 = None, seed: int = 0, mesh=None
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """(ideal[B, nq], noisy[B, nq]) for a batch of Hamiltonian params."""
        # Keyed on the mesh so an unsharded warm-up call cannot pin later
        # sharded calls to the wrong program (and vice versa).
        fn = self._compiled.get(mesh)
        if fn is None:
            fn = self._compiled[mesh] = self._build(mesh)
        J_values = np.asarray(J_values, np.float32)
        names = [p.name for p in self.template.parameters]
        cols = []
        for name in names:
            if name == "J":
                cols.append(J_values)
            elif name == "h":
                if h_values is None:
                    raise ValueError("template has symbolic h; pass h_values")
                cols.append(np.asarray(h_values, np.float32))
        params = np.stack(cols, axis=-1)
        key = prng_key(seed)
        ideal, noisy = fn(jnp.asarray(params), key)
        return np.asarray(ideal), np.asarray(noisy)
