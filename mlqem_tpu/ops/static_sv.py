"""Static-structure statevector engine: reshape/einsum gate application.

For circuit *templates* (shared topology, batched parameters — the Trotter /
MBL / ansatz sweep workloads) every op's qubit indices are static, so gate
application needs no index gathers at all: the state reshapes to expose the
two target bits as size-2 axes and the op is one batched einsum — XLA lowers
this to full-bandwidth transposes + small matmuls instead of the dynamic
gather/scatter of the interpreter path (:mod:`mlqem_tpu.ops.statevector`).
Measured ~6-8x faster per op on TPU; this is the engine behind the
BASELINE throughput number.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.circuit import Circuit, CircuitTensor, tensorize
from ..circuits.gates import GATE_NUM_QUBITS, is_structural
from .unitaries import COMPLEX_DTYPE, op_unitaries

_PERM_SWAP = np.array([0, 2, 1, 3])

# Ideal/template engine: pin true-f32 contractions (TPU DEFAULT matmul
# precision is bf16 passes — measured 1.7e-2 amplitude drift over a
# 148-op 10q template via exactly this einsum; see ops/statevector.py).
# The *trajectory* einsums below stay at DEFAULT on purpose: twirled
# Monte-Carlo noise paths carry sampling noise orders of magnitude above
# bf16 rounding, and they are throughput-bound.
_PREC = jax.lax.Precision.HIGHEST


def apply_static(state: jnp.ndarray, mat4: jnp.ndarray, a: int, b: int,
                 n: int) -> jnp.ndarray:
    """Apply a 4x4 op at STATIC qubits (a, b) to state[..., 2^n].

    mat4 may carry leading batch dims broadcasting with state's.
    """
    lo, hi = (a, b) if a < b else (b, a)
    if a < b:  # matrix index m = 2·v_a + v_b needs (v_hi=b?) — reorder
        mat4 = mat4[..., _PERM_SWAP, :][..., :, _PERM_SWAP]
    H = 2 ** (n - 1 - hi)
    M = 2 ** (hi - lo - 1)
    L = 2 ** lo
    batch = state.shape[:-1]
    view = state.reshape(batch + (H, 2, M, 2, L))
    m4 = mat4.reshape(mat4.shape[:-2] + (2, 2, 2, 2))
    new = jnp.einsum("...abcd,...HcMdL->...HaMbL", m4, view,
                     precision=_PREC)
    return new.reshape(batch + (2 ** n,))


def static_pairs(ct: CircuitTensor) -> List[Tuple[int, int]]:
    """Host-side (a, b) per op slot (b = embedding partner for 1q ops)."""
    q = np.asarray(ct.qubits).reshape(-1, 2)
    return [(int(a), int(b)) for a, b in q]


def run_static(ct_struct: CircuitTensor, params: jnp.ndarray,
               state: Optional[jnp.ndarray] = None,
               dtype=COMPLEX_DTYPE) -> jnp.ndarray:
    """Ideal statevector(s) for a template: params[..., L, 3] batched.

    ``ct_struct`` supplies the shared gate_ids/qubits (unbatched); leading
    dims of ``params`` become batch dims of the state.
    """
    n = max(ct_struct.num_qubits, 2)
    pairs = static_pairs(ct_struct)
    batch = params.shape[:-2]
    gate_ids = jnp.asarray(ct_struct.gate_ids)

    def mats_of(p):
        return op_unitaries(gate_ids, p, dtype)

    for _ in batch:
        mats_of = jax.vmap(mats_of)
    mats = mats_of(params)                       # [..., L, 4, 4]
    if state is None:
        state = jnp.zeros(batch + (2 ** n,), dtype).at[..., 0].set(1.0)
    for l, (a, b) in enumerate(pairs):
        state = apply_static(state, mats[..., l, :, :], a, b, n)
    return state


def run_trajectories_static(ct_struct: CircuitTensor, params: jnp.ndarray,
                            choices: jnp.ndarray, n_traj: int,
                            dtype=COMPLEX_DTYPE) -> jnp.ndarray:
    """Pauli-twirled trajectories on the static engine.

    params: [B, L, 3]; choices: int[B, T, L] sampled Pauli indices per op.
    Returns states [B, T, 2^n]. The sampled Pauli fuses into each op's 4x4
    so per-op cost matches the ideal engine.
    """
    from .trajectory import PAULI_4X4

    n = max(ct_struct.num_qubits, 2)
    pairs = static_pairs(ct_struct)
    B = params.shape[0]
    gate_ids = jnp.asarray(ct_struct.gate_ids)
    mats = jax.vmap(lambda p: op_unitaries(gate_ids, p, dtype))(params)
    pauli = jnp.asarray(PAULI_4X4)
    state = jnp.zeros((B, n_traj, 2 ** n), dtype).at[..., 0].set(1.0)
    for l, (a, b) in enumerate(pairs):
        noise = pauli[choices[:, :, l]]                   # [B, T, 4, 4]
        full = jnp.einsum("btij,bjk->btik", noise, mats[:, l])
        state = apply_static(state, full, a, b, n)
    return state


# ---------------------------------------------------------------------------
# Trajectory-last layout: the TPU-optimal variant
# ---------------------------------------------------------------------------
def apply_static_tlast(state: jnp.ndarray, mat4: jnp.ndarray, a: int, b: int,
                       n: int) -> jnp.ndarray:
    """Apply a 4x4 op with the batch/trajectory axis LAST.

    state: [..., 2^n, T] — amplitude splits land in *leading* axes (free
    row-major views) and the size-T axis stays trailing so the VPU's 128
    lanes vectorize over trajectories. mat4: [..., T, 4, 4] per-lane
    matrices (leading dims broadcast with state's).
    """
    lo, hi = (a, b) if a < b else (b, a)
    if a < b:
        mat4 = mat4[..., _PERM_SWAP, :][..., :, _PERM_SWAP]
    H = 2 ** (n - 1 - hi)
    M = 2 ** (hi - lo - 1)
    L = 2 ** lo
    batch = state.shape[:-2]
    T = state.shape[-1]
    view = state.reshape(batch + (H, 2, M, 2, L, T))
    m4 = mat4.reshape(mat4.shape[:-2] + (2, 2, 2, 2))    # [..., T, 2,2,2,2]
    new = jnp.einsum("...twxcd,...HcMdLt->...HwMxLt", m4, view)
    return new.reshape(batch + (2 ** n, T))


def apply_static_1q_tlast(state: jnp.ndarray, mat2: jnp.ndarray, q: int,
                          n: int) -> jnp.ndarray:
    """2x2 on one static qubit, trajectory-last (half the 4x4 flops)."""
    H = 2 ** (n - 1 - q)
    L = 2 ** q
    batch = state.shape[:-2]
    T = state.shape[-1]
    view = state.reshape(batch + (H, 2, L, T))
    new = jnp.einsum("...twc,...HcLt->...HwLt", mat2, view)
    return new.reshape(batch + (2 ** n, T))


def _mat2_from_mat4(mat4):
    """Extract U from the U⊗I embedding (rows/cols 0,2)."""
    sel = jnp.asarray([0, 2])
    return mat4[..., sel, :][..., :, sel]


def run_trajectories_tlast(ct_struct: CircuitTensor, params: jnp.ndarray,
                           choices: jnp.ndarray, n_traj: int,
                           dtype=COMPLEX_DTYPE) -> jnp.ndarray:
    """Trajectory ensemble with [B, 2^n, T] layout → returns [B, T, 2^n].

    1q ops use the 2x2 fast path; the sampled Pauli fuses into each op.
    """
    from ..circuits.gates import GATE_NAMES
    from .trajectory import PAULI_4X4

    n = max(ct_struct.num_qubits, 2)
    pairs = static_pairs(ct_struct)
    gate_ids_np = np.asarray(ct_struct.gate_ids)
    is_1q = [GATE_NUM_QUBITS.get(GATE_NAMES[int(g)], 1) == 1
             for g in gate_ids_np]
    B = params.shape[0]
    gate_ids = jnp.asarray(ct_struct.gate_ids)
    mats = jax.vmap(lambda p: op_unitaries(gate_ids, p, dtype))(params)
    pauli = jnp.asarray(PAULI_4X4)
    state = jnp.zeros((B, 2 ** n, n_traj), dtype).at[:, 0, :].set(1.0)
    for l, (a, b) in enumerate(pairs):
        noise = pauli[choices[:, :, l]]                     # [B, T, 4, 4]
        full = jnp.einsum("btij,bjk->btik", noise, mats[:, l])
        if is_1q[l]:
            state = apply_static_1q_tlast(
                state, _mat2_from_mat4(full), a, n)
        else:
            state = apply_static_tlast(state, full, a, b, n)
    return jnp.swapaxes(state, -1, -2)


def run_static_tlast(ct_struct: CircuitTensor, params: jnp.ndarray,
                     dtype=COMPLEX_DTYPE) -> jnp.ndarray:
    """Ideal batched statevectors with batch-last layout → [B, 2^n].

    The circuit batch rides the lanes: state [2^n, B].
    """
    from ..circuits.gates import GATE_NAMES

    n = max(ct_struct.num_qubits, 2)
    pairs = static_pairs(ct_struct)
    gate_ids_np = np.asarray(ct_struct.gate_ids)
    is_1q = [GATE_NUM_QUBITS.get(GATE_NAMES[int(g)], 1) == 1
             for g in gate_ids_np]
    B = params.shape[0]
    gate_ids = jnp.asarray(ct_struct.gate_ids)
    mats = jax.vmap(lambda p: op_unitaries(gate_ids, p, dtype))(params)
    state = jnp.zeros((2 ** n, B), dtype).at[0, :].set(1.0)
    for l, (a, b) in enumerate(pairs):
        m = mats[:, l]                                      # [B, 4, 4]
        if is_1q[l]:
            state = apply_static_1q_tlast(
                state, _mat2_from_mat4(m), a, n)
        else:
            state = apply_static_tlast(state, m, a, b, n)
    return state.T
