"""Pauli-frame trajectory engine for rotation+CX circuits.

TPU-native replacement for the generic gather-based trajectory simulator
(:mod:`mlqem_tpu.ops.trajectory`) on the gate set {id, x, y, z, rx, ry,
rz, cx} — which covers every parameterized family the data pipelines
generate (Ising/MBL Trotter, hardware-efficient ansatz in rz/rx/cx basis).

The trick (the 1-gate-set generalization of ``ops/kicked_ising.py``):
sampled Pauli noise insertions are never applied to the state. Each
trajectory keeps a Pauli *frame* F (two uint32 bitmasks per trajectory)
with ``state_phys = F · state_frame``:

* a noise Pauli left-multiplies the frame — two XORs;
* CX conjugates the frame (X_a→X_aX_b, Z_b→Z_aZ_b — two masked XORs) and
  applies its *shared* permutation to the state;
* a rotation R_A(θ) passes through F unchanged, with θ sign-flipped when
  F anticommutes with the axis at that qubit — so the state update is the
  *shared* rotation with a per-trajectory ±1 on the sin term;
* measurement: physical probabilities are the frame-X-mask XOR-permuted
  trajectory probabilities (frame phases are global and drop out).

Consequences for the TPU: the op loop is unrolled with STATIC qubit axes
(the template's gate list is fixed), every state update is elementwise
math or a static axis flip — no dynamic gathers, no per-trajectory 4×4
matrix gathers/einsums, and XLA fuses adjacent diagonal ops. Replaces the
per-op ``state[..., pair_indices]`` gather/scatter of the reference-shaped
engine (reference runs Aer per circuit in a process pool instead:
``vqe_data_gen_parallel.py:100-126``).
"""
from __future__ import annotations

import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.circuit import CircuitTensor
from ..circuits.gates import GATE_IDS

# gate ids the frame engine supports (x/y/z are π-rotations up to a global
# phase, which probabilities never see)
_SUPPORTED = {GATE_IDS[g] for g in
              ("nop", "id", "x", "y", "z", "rx", "ry", "rz", "cx")}
_ID_NOP = (GATE_IDS["nop"], GATE_IDS["id"])
_RX, _RY, _RZ = GATE_IDS["rx"], GATE_IDS["ry"], GATE_IDS["rz"]
_X, _Y, _Z, _CX = (GATE_IDS["x"], GATE_IDS["y"], GATE_IDS["z"],
                   GATE_IDS["cx"])

# per-2q-Pauli-code (4·ca+cb, code 0=I,1=X,2=Y,3=Z) frame bit contributions
_CODE_X = np.array([c in (1, 2) for c in range(4)], np.int32)
_CODE_Z = np.array([c in (2, 3) for c in range(4)], np.int32)
XBIT_A = np.repeat(_CODE_X, 4).astype(np.int32)        # [16] x-bit of ca
ZBIT_A = np.repeat(_CODE_Z, 4).astype(np.int32)
XBIT_B = np.tile(_CODE_X, 4).astype(np.int32)          # [16] x-bit of cb
ZBIT_B = np.tile(_CODE_Z, 4).astype(np.int32)


def frame_supported(ct: CircuitTensor, num_qubits: Optional[int] = None
                    ) -> bool:
    """True when every op is in the frame gate set and the width fits the
    int32 frame masks."""
    n = num_qubits if num_qubits is not None else ct.num_qubits
    if n > 30:
        return False
    gids = np.asarray(ct.gate_ids).reshape(-1)
    return bool(np.all(np.isin(gids, list(_SUPPORTED))))


@functools.lru_cache(maxsize=64)
def _sign_vec(n: int, q: int):
    """Host constant (−1)^{bit_q(j)} over j ∈ [0, 2^n): float32[dim]."""
    j = np.arange(2 ** n, dtype=np.int64)
    return ((1 - 2 * ((j >> q) & 1)).astype(np.float32))


@functools.lru_cache(maxsize=64)
def _flip_idx(n: int, q: int):
    """Host constant j ^ (1<<q) over j ∈ [0, 2^n): int32[dim]."""
    return (np.arange(2 ** n, dtype=np.int32) ^ np.int32(1 << q))


def _flip(st, n: int, q: int):
    """st[..., j ^ (1<<q)] as a constant-index gather on the lane axis.

    Measured on v5e: this lowering keeps peak HBM flat across the whole
    unrolled op list, where reshape+reverse views leave several
    state-sized reverse temporaries live at once (OOM at B=8192) and run
    ~15% slower when they fit.
    """
    return jnp.take(st, jnp.asarray(_flip_idx(n, q)), axis=-1)


def _cx_perm(st, n: int, a: int, b: int):
    """CX(a control, b target): flip bit b where bit a is set."""
    flipped = _flip(st, n, b)
    ctrl = jnp.asarray(0.5 * (1.0 - _sign_vec(n, a)))     # bit_a(j) as 0/1
    return st * (1.0 - ctrl) + flipped * ctrl


def _run_frame(gate_ids, qubits, params, choices, num_qubits):
    """One circuit: params [L, 3], choices int32 [T, L] → probs [T, dim].

    gate_ids/qubits must be HOST numpy (static unroll).
    """
    n = max(num_qubits, 2)
    dim = 2 ** n
    T = choices.shape[0]
    L = gate_ids.shape[0]

    st = jnp.zeros((T, dim), jnp.complex64).at[:, 0].set(1.0)
    fx = jnp.zeros((T,), jnp.int32)     # frame X mask (bit q = X_q present)
    fz = jnp.zeros((T,), jnp.int32)

    xa_t, za_t = jnp.asarray(XBIT_A), jnp.asarray(ZBIT_A)
    xb_t, zb_t = jnp.asarray(XBIT_B), jnp.asarray(ZBIT_B)

    for l in range(L):
        g = int(gate_ids[l])
        if g in _ID_NOP:
            continue
        a, b = int(qubits[l, 0]), int(qubits[l, 1])
        if g == _CX:
            st = _cx_perm(st, n, a, b)
            # frame conjugation: X_a → X_a X_b, Z_b → Z_a Z_b
            fx = fx ^ (((fx >> a) & 1) << b)
            fz = fz ^ (((fz >> b) & 1) << a)
        else:
            # rotation R_A(θ) (x/y/z are θ=π up to global phase)
            if g in (_RX, _RY, _RZ):
                theta = params[l, 0]
                axis = {_RX: "x", _RY: "y", _RZ: "z"}[g]
            else:
                theta = jnp.float32(np.pi)
                axis = {_X: "x", _Y: "y", _Z: "z"}[g]
            if axis == "x":
                anti = (fz >> a) & 1
            elif axis == "z":
                anti = (fx >> a) & 1
            else:
                anti = ((fx ^ fz) >> a) & 1
            s_t = (1.0 - 2.0 * anti.astype(jnp.float32))[:, None]  # [T, 1]
            c = jnp.cos(theta / 2.0)
            sn = jnp.sin(theta / 2.0)
            sz = jnp.asarray(_sign_vec(n, a))[None]                # [1, dim]
            if axis == "z":
                st = st * (c - 1j * (s_t * sn) * sz)
            elif axis == "x":
                st = c * st - 1j * (s_t * sn) * _flip(st, n, a)
            else:  # y: (Yψ)_j = i(2b_j−1)·ψ_flip → c·st − w·(1−2b)·flip
                st = c * st - (s_t * sn) * sz * _flip(st, n, a)
        # sampled noise Pauli left-multiplies the frame (phases are global)
        code = choices[:, l]
        fx = fx ^ (xa_t[code] << a) ^ (xb_t[code] << b)
        fz = fz ^ (za_t[code] << a) ^ (zb_t[code] << b)

    probs = jnp.real(st * jnp.conj(st))
    # physical probs: XOR-permute by the frame X mask (one structured gather)
    j = jnp.arange(dim, dtype=jnp.int32)[None]
    return jnp.take_along_axis(probs, j ^ fx[:, None], axis=1)


@partial(jax.jit, static_argnames=("gids", "qubs", "num_qubits"))
def _run_frame_batch(params, choices, gids, qubs, num_qubits):
    gate_ids = np.asarray(gids, np.int32)
    qubits = np.asarray(qubs, np.int32)

    def one(params_b, choices_b):
        return _run_frame(gate_ids, qubits, params_b, choices_b, num_qubits)

    return jax.vmap(one)(params, choices)


def run_frame_trajectories_probs(ct_struct: CircuitTensor,
                                 params: jnp.ndarray,
                                 choices: jnp.ndarray,
                                 n_traj: int,
                                 num_qubits: int) -> jnp.ndarray:
    """Physical outcome distributions: [B, T, dim].

    Same contract as ``run_trajectories_presampled`` + |amplitude|², for
    circuits passing :func:`frame_supported`. params [B, L, 3],
    choices int[B, T, L] (16-code 2q Paulis at each op's qubit pair).
    """
    gids = tuple(int(g) for g in np.asarray(ct_struct.gate_ids).reshape(-1))
    qubs = tuple(tuple(int(x) for x in row)
                 for row in np.asarray(ct_struct.qubits).reshape(-1, 2))
    return _run_frame_batch(params, choices, gids, qubs, num_qubits)
