"""Batched statevector simulator.

TPU-native replacement for the ideal half of the reference's Aer data engine
(``blackwater/data/utils.py:418-431`` ``create_estimator_meas_data``): a
branch-free ``lax.scan`` applies every op as a uniform 4x4 unitary via
dynamic bit-index gathers, so a whole batch of same-shape circuits is one
compiled program — vmapped over thousands of circuits instead of the
reference's per-circuit ``multiprocessing.Pool`` fan-out
(``docs/tutorials/vqe_data_gen_parallel.py:100-126``).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.circuit import Circuit, CircuitTensor, stack_circuits, tensorize
from ..circuits.observables import PauliSum
from .unitaries import (COMPLEX_DTYPE, op_unitaries, pair_indices, popcount)


# Ideal-label engine: pin true-f32 contractions. JAX's DEFAULT matmul
# precision on TPU computes f32 dots in bf16 passes — measured 1.7e-2
# max amplitude drift vs CPU-f32 over a 148-op 10q template (the K=4
# gate einsum accumulates ~4e-3 relative per MXU-lowered contraction).
# HIGHEST restores exactness (~1e-6) and is a no-op on CPU.
_PREC = jax.lax.Precision.HIGHEST


def _sim_width(num_qubits: int) -> int:
    return max(num_qubits, 2)


def zero_state(num_qubits: int, batch_shape=(), dtype=COMPLEX_DTYPE):
    n = _sim_width(num_qubits)
    state = jnp.zeros(batch_shape + (2 ** n,), dtype)
    return state.at[..., 0].set(1.0)


def apply_op(state: jnp.ndarray, mat4: jnp.ndarray, a: jnp.ndarray,
             b: jnp.ndarray, n: int) -> jnp.ndarray:
    """Apply one 4x4 unitary at qubits (a, b) to state[..., 2**n]."""
    idx = pair_indices(a, b, n)                       # [4, R]
    amps = state[..., idx]                            # [..., 4, R]
    new = jnp.einsum("ij,...jr->...ir", mat4, amps, precision=_PREC)
    return state.at[..., idx].set(new)


def apply_circuit(state: jnp.ndarray, ct: CircuitTensor) -> jnp.ndarray:
    """Run all ops of one tensorized circuit over state[..., 2**n]."""
    n = _sim_width(ct.num_qubits)
    mats = op_unitaries(ct.gate_ids, ct.params, state.dtype)

    def step(s, op):
        mat4, qp = op
        return apply_op(s, mat4, qp[0], qp[1], n), None

    state, _ = jax.lax.scan(step, state, (mats, ct.qubits))
    return state


def statevector(ct: CircuitTensor) -> jnp.ndarray:
    """|ψ⟩ = U_circuit |0…0⟩ for one tensorized circuit."""
    return apply_circuit(zero_state(ct.num_qubits), ct)


# ---------------------------------------------------------------------------
# Expectation values
# ---------------------------------------------------------------------------
def expval_pauli_masks(state: jnp.ndarray, x_mask, z_mask, y_count,
                       n: int) -> jnp.ndarray:
    """⟨ψ|P|ψ⟩ for a single Pauli given bitmasks.

    P = ⊗_q σ_q with x_mask/z_mask per :meth:`PauliTerm.masks`;
    ⟨ψ|P|ψ⟩ = Σ_j conj(ψ_j)·(-i)^{#Y}·(-1)^{popcount(j & z_mask)}·ψ_{j⊕x}.
    """
    dim = state.shape[-1]
    j = jnp.arange(dim, dtype=jnp.int32)
    sign = 1 - 2 * (popcount(j & jnp.int32(z_mask)) & 1)
    phase = (-1j) ** (y_count % 4)
    flipped = state[..., j ^ jnp.int32(x_mask)]
    vals = jnp.sum(jnp.conj(state) * sign * flipped, axis=-1) * phase
    return jnp.real(vals)


def expval_pauli_sum(state: jnp.ndarray, obs: PauliSum) -> jnp.ndarray:
    """⟨ψ|O|ψ⟩ for a PauliSum observable (static Python loop over terms)."""
    n = int(np.log2(state.shape[-1]))
    total = 0.0
    xs, zs = obs.masks()
    for term, x, z in zip(obs.terms, xs, zs):
        y_count = sum(1 for c in term.pauli if c == "Y")
        total = total + np.real(term.coeff) * expval_pauli_masks(
            state, int(x), int(z), y_count, n)
    return total


def probabilities(state: jnp.ndarray) -> jnp.ndarray:
    return jnp.real(state * jnp.conj(state))


def z_expectations(probs: jnp.ndarray, num_qubits: int) -> jnp.ndarray:
    """Per-qubit ⟨Z_q⟩ from a probability vector.

    Counts-domain parity with ``cal_z_exp`` (``mbd_utils.py:328-350``), which
    returns +1 for bit value 1 — i.e. the reference's 'z_exp' is
    P(1) - P(0) = -⟨Z⟩ in physics convention. We return the physics ⟨Z⟩ here;
    :func:`mlqem_tpu.data.encoders.cal_z_exp` applies the reference's sign.
    """
    dim = probs.shape[-1]
    j = jnp.arange(dim, dtype=jnp.int32)
    outs = []
    for q in range(num_qubits):
        sign = 1 - 2 * ((j >> q) & 1)
        outs.append(jnp.sum(probs * sign, axis=-1))
    return jnp.stack(outs, axis=-1)


def all_z_expectation(probs: jnp.ndarray, num_qubits: int) -> jnp.ndarray:
    """⟨Z⊗…⊗Z⟩ from probabilities (``cal_all_z_exp`` parity)."""
    dim = probs.shape[-1]
    j = jnp.arange(dim, dtype=jnp.int32)
    mask = jnp.int32(2 ** num_qubits - 1)
    sign = 1 - 2 * (popcount(j & mask) & 1)
    return jnp.sum(probs * sign, axis=-1)


# ---------------------------------------------------------------------------
# High-level batched entry points
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("num_qubits", "max_ops"))
def _batched_statevectors(gate_ids, qubits, params, num_qubits, max_ops):
    ct = CircuitTensor(gate_ids, qubits, params, num_qubits)
    return jax.vmap(
        lambda g, q, p: statevector(CircuitTensor(g, q, p, num_qubits))
    )(ct.gate_ids, ct.qubits, ct.params)


def batch_statevectors(ct: CircuitTensor) -> jnp.ndarray:
    """Statevectors for a batch: gate_ids[B, L] → complex[B, 2**n]."""
    return _batched_statevectors(ct.gate_ids, ct.qubits, ct.params,
                                 ct.num_qubits, ct.max_ops)


def ideal_expectation_values(circuits: Sequence[Circuit] | CircuitTensor,
                             observables: Sequence[PauliSum] | PauliSum
                             ) -> np.ndarray:
    """Exact ⟨O⟩ per circuit — the framework's ideal-label generator.

    Replaces the reference's per-circuit ``AerEstimator().run([circ],[obs])``
    (``data/utils.py:422-424``) with one batched TPU program.
    """
    ct = circuits if isinstance(circuits, CircuitTensor) \
        else stack_circuits(list(circuits))
    states = batch_statevectors(ct)
    if isinstance(observables, PauliSum):
        return np.asarray(expval_pauli_sum(states, observables))
    vals = [np.asarray(expval_pauli_sum(states[i], obs))
            for i, obs in enumerate(observables)]
    return np.array(vals)
