"""Batched density-matrix simulator with noise channels.

The exact-noise half of the data engine: replaces Aer's noisy simulation
(``AerSimulator.from_backend`` / noisy ``AerEstimator``,
``blackwater/data/utils.py:426-430``). Every op — unitary *and* its attached
noise channel — is one uniform 16×16 superoperator applied to a gathered
local block of the density matrix, so the scan body is branch-free and the
inner contraction is a matmul.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.circuit import Circuit, CircuitTensor, stack_circuits, tensorize
from ..circuits.observables import PauliSum
from .unitaries import COMPLEX_DTYPE, op_unitaries, pair_indices, popcount


# Exactness engine: pin true-f32 contractions (TPU DEFAULT matmul
# precision computes f32 dots in bf16 passes, ~4e-3 relative per
# MXU-lowered contraction — measured; see ops/statevector.py).
_PREC = jax.lax.Precision.HIGHEST


def _sim_width(num_qubits: int) -> int:
    return max(num_qubits, 2)


def density_zero(num_qubits: int, batch_shape=(), dtype=COMPLEX_DTYPE):
    n = _sim_width(num_qubits)
    dm = jnp.zeros(batch_shape + (2 ** n, 2 ** n), dtype)
    return dm.at[..., 0, 0].set(1.0)


def apply_superop(dm: jnp.ndarray, s16: jnp.ndarray, a: jnp.ndarray,
                  b: jnp.ndarray, n: int) -> jnp.ndarray:
    """Apply a 16×16 local superoperator at qubits (a, b).

    Layout: local block G[p, q] = dm[row_idx[p], col_idx[q]] flattened as
    k = 4p + q; S maps k_in → k_out.
    """
    idx = pair_indices(a, b, n)                       # [4, R]
    rows = idx[:, :, None, None]
    cols = idx[None, None, :, :]
    block = dm[..., rows, cols]                       # [..., 4, R, 4, R]
    s4 = s16.reshape(4, 4, 4, 4)                      # [p', q', p, q]
    new = jnp.einsum("PQpq,...prqs->...PrQs", s4, block, precision=_PREC)
    return dm.at[..., rows, cols].set(new)


def gate_superop(mat4: jnp.ndarray) -> jnp.ndarray:
    """Unitary superoperator kron(U, conj(U)) → 16×16."""
    return jnp.einsum("pa,qc->pqac", mat4, jnp.conj(mat4)).reshape(16, 16)


def run_density(ct: CircuitTensor, key_ids: jnp.ndarray,
                noise_table: jnp.ndarray,
                dm0: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Evolve |0..0⟩⟨0..0| (or dm0) through circuit + noise.

    Args:
        ct: one tensorized circuit (unbatched leading dims).
        key_ids: int32[L] indices into noise_table per op.
        noise_table: complex[K, 16, 16] channel superops (entry 0 = identity).
    """
    n = _sim_width(ct.num_qubits)
    dm = density_zero(ct.num_qubits) if dm0 is None else dm0
    mats = op_unitaries(ct.gate_ids, ct.params, dm.dtype)
    # 32-bit at the host→device boundary (axon rejects 64-bit buffers) AND
    # no complex across it either (axon cannot transfer complex64 in any
    # direction — combine real/imag parts on device instead)
    if isinstance(noise_table, tuple):
        tr, ti = noise_table
        noise_table = (jnp.asarray(tr) + 1j * jnp.asarray(ti)).astype(
            dm.dtype)
    else:
        if isinstance(noise_table, np.ndarray):
            noise_table = noise_table.astype(np.complex64)
        noise_table = jnp.asarray(noise_table).astype(dm.dtype)
    key_ids = jnp.asarray(np.asarray(key_ids, np.int32)
                          if isinstance(key_ids, np.ndarray) else key_ids)

    def step(state, op):
        mat4, qp, key = op
        s16 = jnp.einsum("ij,jk->ik", noise_table[key],
                         gate_superop(mat4), precision=_PREC)
        return apply_superop(state, s16, qp[0], qp[1], n), None

    dm, _ = jax.lax.scan(step, dm, (mats, ct.qubits, key_ids))
    return dm


def _split_complex_host(table) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Host complex array → (real, imag) float32 device args.

    The axon TPU platform cannot transfer complex64 host→device; complex
    values must cross the boundary as float pairs and recombine in-jit.
    """
    t = np.asarray(table, np.complex64)
    return (jnp.asarray(np.real(t).astype(np.float32)),
            jnp.asarray(np.imag(t).astype(np.float32)))


@partial(jax.jit, static_argnames=("num_qubits",))
def _batched_density(gate_ids, qubits, params, key_ids, table_r, table_i,
                     num_qubits):
    def one(g, q, p, k):
        return run_density(CircuitTensor(g, q, p, num_qubits), k,
                           (table_r, table_i))

    return jax.vmap(one)(gate_ids, qubits, params, key_ids)


def batch_density_matrices(ct: CircuitTensor, key_ids, noise_table
                           ) -> jnp.ndarray:
    """Density matrices for a circuit batch."""
    tr, ti = _split_complex_host(noise_table)
    return _batched_density(ct.gate_ids, ct.qubits, ct.params,
                            jnp.asarray(np.asarray(key_ids, np.int32)),
                            tr, ti, ct.num_qubits)


@partial(jax.jit, static_argnames=("num_qubits",))
def _batched_density_from(gate_ids, qubits, params, key_ids, table_r,
                          table_i, dm0, num_qubits):
    def one(g, q, p, k, d):
        return run_density(CircuitTensor(g, q, p, num_qubits), k,
                           (table_r, table_i), dm0=d)

    return jax.vmap(one)(gate_ids, qubits, params, key_ids, dm0)


def batch_density_matrices_from(ct: CircuitTensor, key_ids, noise_table,
                                dm0: jnp.ndarray) -> jnp.ndarray:
    """Evolve a batch of initial density matrices through a circuit batch.

    Used to apply per-group measurement-basis rotations (with their noise)
    to already-evolved states in a single compiled call. ``dm0`` must be a
    device-resident array (a previous jit's output) — only HOST complex
    is barred from crossing to the device.
    """
    tr, ti = _split_complex_host(noise_table)
    return _batched_density_from(
        ct.gate_ids, ct.qubits, ct.params,
        jnp.asarray(np.asarray(key_ids, np.int32)),
        tr, ti, dm0, ct.num_qubits)


# ---------------------------------------------------------------------------
# Measurement-side ops
# ---------------------------------------------------------------------------
def dm_probabilities(dm: jnp.ndarray) -> jnp.ndarray:
    """Diagonal of ρ — the Z-basis outcome distribution."""
    return jnp.real(jnp.diagonal(dm, axis1=-2, axis2=-1))


def apply_readout_confusion(probs: jnp.ndarray,
                            confusion: jnp.ndarray,
                            num_qubits: int,
                            variant: str = "einsum") -> jnp.ndarray:
    """Apply per-qubit 2×2 assignment matrices to a probability vector.

    confusion: [nq, 2, 2] column-stochastic M[meas, true].

    variant "einsum" (default): per-qubit [..., high, 2, low] reshape +
    einsum — fastest inside scan-based programs (the kicked/dm paths).
    variant "xor": elementwise sign-vector math + one constant XOR-index
    gather per qubit — required inside large UNROLLED programs (the frame
    trajectory engine), where XLA materializes the reshape views as
    (2,128)-tiled buffers whose lane axis pads 64× (34GB at B=8192·T=32).
    """
    if variant == "einsum":
        dim = probs.shape[-1]
        batch = probs.shape[:-1]
        for q in range(num_qubits):
            m = confusion[q].astype(probs.dtype)
            low, high = 2 ** q, dim // (2 ** (q + 1))
            p = probs.reshape(batch + (high, 2, low))
            p = jnp.einsum("mt,...htl->...hml", m, p)
            probs = p.reshape(batch + (dim,))
        return probs
    dim = probs.shape[-1]
    for q in range(num_qubits):
        m = confusion[q].astype(probs.dtype)
        j = np.arange(dim, dtype=np.int64)
        bit = jnp.asarray(((j >> q) & 1).astype(np.float32)).astype(
            probs.dtype)
        keep = m[0, 0] * (1 - bit) + m[1, 1] * bit     # M[b, b]
        cross = m[0, 1] * (1 - bit) + m[1, 0] * bit    # M[b, 1−b]
        flip_idx = jnp.asarray((j ^ (1 << q)).astype(np.int32))
        probs = keep * probs + cross * jnp.take(probs, flip_idx, axis=-1)
    return probs


def expval_pauli_dm(dm: jnp.ndarray, x_mask: int, z_mask: int,
                    y_count: int) -> jnp.ndarray:
    """tr(Pρ) = Σ_j amp(j)·ρ[j⊕x, j] with amp(j) as in the statevector case."""
    dim = dm.shape[-1]
    j = jnp.arange(dim, dtype=jnp.int32)
    sign = 1 - 2 * (popcount(j & jnp.int32(z_mask)) & 1)
    phase = (-1j) ** (y_count % 4)
    vals = jnp.sum(dm[..., j ^ jnp.int32(x_mask), j] * sign, axis=-1) * phase
    return jnp.real(vals)


def expval_pauli_sum_dm(dm: jnp.ndarray, obs: PauliSum) -> jnp.ndarray:
    total = 0.0
    xs, zs = obs.masks()
    for term, x, z in zip(obs.terms, xs, zs):
        y_count = sum(1 for c in term.pauli if c == "Y")
        total = total + np.real(term.coeff) * expval_pauli_dm(
            dm, int(x), int(z), y_count)
    return total


def purity(dm: jnp.ndarray) -> jnp.ndarray:
    return jnp.real(jnp.einsum("...ij,...ji->...", dm, dm))
