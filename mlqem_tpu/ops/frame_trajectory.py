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

# Pauli-axis rotations: gate → (axis, fixed angle or None=parameter).
# Phase/global-phase differences (s = e^{iπ/4} rz(π/2), t, sx, p, …) never
# reach probabilities, so every member reduces to rx/ry/rz semantics.
_ROTATIONS = {
    GATE_IDS["rx"]: ("x", None), GATE_IDS["ry"]: ("y", None),
    GATE_IDS["rz"]: ("z", None), GATE_IDS["p"]: ("z", None),
    GATE_IDS["x"]: ("x", np.pi), GATE_IDS["y"]: ("y", np.pi),
    GATE_IDS["z"]: ("z", np.pi),
    GATE_IDS["s"]: ("z", np.pi / 2), GATE_IDS["sdg"]: ("z", -np.pi / 2),
    GATE_IDS["t"]: ("z", np.pi / 4), GATE_IDS["tdg"]: ("z", -np.pi / 4),
    GATE_IDS["sx"]: ("x", np.pi / 2), GATE_IDS["sxdg"]: ("x", -np.pi / 2),
}
_ID_NOP = (GATE_IDS["nop"], GATE_IDS["id"])
_H = GATE_IDS["h"]
_CX, _CY, _CZ, _SWAP = (GATE_IDS["cx"], GATE_IDS["cy"], GATE_IDS["cz"],
                        GATE_IDS["swap"])
_RZZ = GATE_IDS["rzz"]
_CLIFF2 = (_CX, _CY, _CZ, _SWAP)
_SUPPORTED = (set(_ROTATIONS) | set(_ID_NOP) | {_H, _RZZ} | set(_CLIFF2))

# per-2q-Pauli-code (4·ca+cb, code 0=I,1=X,2=Y,3=Z) frame bit contributions
_CODE_X = np.array([c in (1, 2) for c in range(4)], np.int32)
_CODE_Z = np.array([c in (2, 3) for c in range(4)], np.int32)
XBIT_A = np.repeat(_CODE_X, 4).astype(np.int32)        # [16] x-bit of ca
ZBIT_A = np.repeat(_CODE_Z, 4).astype(np.int32)
XBIT_B = np.tile(_CODE_X, 4).astype(np.int32)          # [16] x-bit of cb
ZBIT_B = np.tile(_CODE_Z, 4).astype(np.int32)


def _conj2_table(U: np.ndarray) -> np.ndarray:
    """new_code[16]: how conjugation by the 2q Clifford U permutes the 16
    local Pauli codes (signs drop — they are global phases on the state)."""
    from .pauli_prop import _code_mat, _find_code_sign

    codes = np.zeros(16, np.int32)
    for c in range(16):
        m = U @ _code_mat(c) @ U.conj().T
        nc, s = _find_code_sign(m)
        assert s in (1, -1), (c, s)
        codes[c] = nc
    return codes


# dense 4x4s match ops/unitaries.py (a = MSB convention)
_Y2 = np.array([[0, -1j], [1j, 0]])
_CLIFF2_CODES = {
    _CX: _conj2_table(np.eye(4)[[0, 1, 3, 2]].astype(complex)),
    _CY: _conj2_table(np.block([[np.eye(2), np.zeros((2, 2))],
                                [np.zeros((2, 2)), _Y2]])),
    _CZ: _conj2_table(np.diag([1.0, 1, 1, -1]).astype(complex)),
    _SWAP: _conj2_table(np.eye(4)[[0, 2, 1, 3]].astype(complex)),
}


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

    def local_code(mx, mz, q):
        xb = (mx >> q) & 1
        zb = (mz >> q) & 1
        return jnp.where(xb == 1, jnp.where(zb == 1, 2, 1),
                         jnp.where(zb == 1, 3, 0))

    def bit_vec(q):
        return 0.5 * (1.0 - jnp.asarray(_sign_vec(n, q)))   # bit_q(j) 0/1

    for l in range(L):
        g = int(gate_ids[l])
        a, b = int(qubits[l, 0]), int(qubits[l, 1])
        if g in _ID_NOP:
            # the GATE is trivial but its noise channel is not ('id' under
            # a device model carries idle T1/T2 error) — only the state
            # update is skipped, the sampled Pauli still enters the frame
            pass
        elif g in _CLIFF2:
            # state: shared Clifford on (a, b)
            if g == _CX:
                st = _cx_perm(st, n, a, b)
            elif g == _CY:
                ctrl = bit_vec(a)
                yb = 1j * (-jnp.asarray(_sign_vec(n, b)))   # i(2·bit_b−1)
                st = st * (1.0 - ctrl) + yb * _flip(st, n, b) * ctrl
            elif g == _CZ:
                st = st * (1.0 - 2.0 * bit_vec(a) * bit_vec(b))
            else:  # swap: exchange bits a and b where they differ
                ba, bb = bit_vec(a), bit_vec(b)
                differ = ba + bb - 2.0 * ba * bb
                both = _flip(_flip(st, n, a), n, b)
                st = st * (1.0 - differ) + both * differ
            # frame: conjugate the local 2q code through the Clifford
            code_f = 4 * local_code(fx, fz, a) + local_code(fx, fz, b)
            nc = jnp.asarray(_CLIFF2_CODES[g])[code_f]
            clear = np.int32(~((1 << a) | (1 << b)) & 0x7fffffff)
            fx = (fx & clear) | (jnp.asarray(XBIT_A)[nc] << a) \
                | (jnp.asarray(XBIT_B)[nc] << b)
            fz = (fz & clear) | (jnp.asarray(ZBIT_A)[nc] << a) \
                | (jnp.asarray(ZBIT_B)[nc] << b)
        elif g == _H:
            # state: (sz·st + flip)/√2; frame: X↔Z bit swap at a
            sz = jnp.asarray(_sign_vec(n, a))[None]
            st = (sz * st + _flip(st, n, a)) * np.float32(1 / np.sqrt(2))
            d = ((fx ^ fz) >> a) & 1
            fx = fx ^ (d << a)
            fz = fz ^ (d << a)
        elif g == _RZZ:
            theta = params[l, 0]
            anti = ((fx >> a) ^ (fx >> b)) & 1   # anticommutes with Z⊗Z
            s_t = (1.0 - 2.0 * anti.astype(jnp.float32))[:, None]
            c = jnp.cos(theta / 2.0)
            sn = jnp.sin(theta / 2.0)
            szz = (jnp.asarray(_sign_vec(n, a))
                   * jnp.asarray(_sign_vec(n, b)))[None]
            st = st * (c - 1j * (s_t * sn) * szz)
        else:
            # Pauli-axis rotation (fixed-angle members are phase-equal:
            # s = e^{iπ/4}·rz(π/2), t, sx, x/y/z, p — probabilities never
            # see the global phase)
            axis, fixed = _ROTATIONS[g]
            theta = params[l, 0] if fixed is None else jnp.float32(fixed)
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


# ---------------------------------------------------------------------------
# fused marginal path (Pallas kernel on TPU)
# ---------------------------------------------------------------------------
def _build_plan(gate_ids: np.ndarray, qubits: np.ndarray):
    """Static kernel plan + per-rotation angle metadata.

    Returns (plan, rot_meta): plan is a tuple of (kind, a, b, theta_slot)
    for :func:`mlqem_tpu.ops.pallas.frame_evolve.evolve_frame_marginals`;
    rot_meta is a list of (op_index, axis, fixed_angle_or_None) — one entry
    per theta slot, in op order (the sign-folded angle stream's columns).
    """
    from .pallas import frame_evolve as fe

    plan = []
    rot_meta = []
    kind_1q = {"x": fe.ROT_X, "y": fe.ROT_Y, "z": fe.ROT_Z}
    cliff = {_CX: fe.GATE_CX, _CY: fe.GATE_CY, _CZ: fe.GATE_CZ,
             _SWAP: fe.GATE_SWAP}
    for l, g in enumerate(gate_ids):
        g = int(g)
        a, b = int(qubits[l, 0]), int(qubits[l, 1])
        if g in _ID_NOP:
            continue
        if g in _CLIFF2:
            plan.append((cliff[g], a, b, -1))
        elif g == _H:
            plan.append((fe.GATE_H, a, b, -1))
        elif g == _RZZ:
            plan.append((fe.ROT_ZZ, a, b, len(rot_meta)))
            rot_meta.append((l, "zz", None))
        else:
            axis, fixed = _ROTATIONS[g]
            plan.append((kind_1q[axis], a, b, len(rot_meta)))
            rot_meta.append((l, axis, fixed))
    return tuple(plan), rot_meta


def _frame_walk(gate_ids: np.ndarray, qubits: np.ndarray, rot_meta,
                choices: jnp.ndarray):
    """Integer-only frame evolution: rotation signs + final X mask.

    choices int32 [..., L] → (signs f32 [..., n_rot] ∈ {±1} in theta-slot
    order, fx int32 [...]). Mirrors the frame updates of :func:`_run_frame`
    exactly (gate conjugation, then the sampled noise Pauli) without
    touching the state — the state work moves to the fused Pallas kernel.
    """
    L = gate_ids.shape[0]
    lead = choices.shape[:-1]
    fx = jnp.zeros(lead, jnp.int32)
    fz = jnp.zeros(lead, jnp.int32)
    xa_t, za_t = jnp.asarray(XBIT_A), jnp.asarray(ZBIT_A)
    xb_t, zb_t = jnp.asarray(XBIT_B), jnp.asarray(ZBIT_B)
    axis_of = {l: ax for (l, ax, _) in rot_meta}

    def local_code(mx, mz, q):
        xb = (mx >> q) & 1
        zb = (mz >> q) & 1
        return jnp.where(xb == 1, jnp.where(zb == 1, 2, 1),
                         jnp.where(zb == 1, 3, 0))

    signs = []
    for l in range(L):
        g = int(gate_ids[l])
        a, b = int(qubits[l, 0]), int(qubits[l, 1])
        if g in _ID_NOP:
            pass
        elif g in _CLIFF2:
            code_f = 4 * local_code(fx, fz, a) + local_code(fx, fz, b)
            nc = jnp.asarray(_CLIFF2_CODES[g])[code_f]
            clear = np.int32(~((1 << a) | (1 << b)) & 0x7fffffff)
            fx = (fx & clear) | (jnp.asarray(XBIT_A)[nc] << a) \
                | (jnp.asarray(XBIT_B)[nc] << b)
            fz = (fz & clear) | (jnp.asarray(ZBIT_A)[nc] << a) \
                | (jnp.asarray(ZBIT_B)[nc] << b)
        elif g == _H:
            d = ((fx ^ fz) >> a) & 1
            fx = fx ^ (d << a)
            fz = fz ^ (d << a)
        else:
            axis = axis_of[l]
            if axis == "zz":
                anti = ((fx >> a) ^ (fx >> b)) & 1
            elif axis == "x":
                anti = (fz >> a) & 1
            elif axis == "z":
                anti = (fx >> a) & 1
            else:
                anti = ((fx ^ fz) >> a) & 1
            signs.append(1.0 - 2.0 * anti.astype(jnp.float32))
        code = choices[..., l]
        fx = fx ^ (xa_t[code] << a) ^ (xb_t[code] << b)
        fz = fz ^ (za_t[code] << a) ^ (zb_t[code] << b)
    if signs:
        return jnp.stack(signs, axis=-1), fx
    return jnp.zeros(lead + (0,), jnp.float32), fx


@partial(jax.jit, static_argnames=("gids", "qubs", "num_qubits",
                                   "interpret"))
def _run_frame_marginals(params, choices, confusion, gids, qubs,
                         num_qubits, interpret=False):
    from .pallas.frame_evolve import evolve_frame_marginals

    gate_ids = np.asarray(gids, np.int32)
    qubits = np.asarray(qubs, np.int32)
    plan, rot_meta = _build_plan(gate_ids, qubits)
    B, T, L = choices.shape
    R = len(rot_meta)

    signs, fx = _frame_walk(gate_ids, qubits, rot_meta, choices)  # [B,T,R]
    # per-circuit base angles in theta-slot order
    cols = [params[:, l, 0] if fixed is None else
            jnp.full((B,), np.float32(fixed))
            for (l, _, fixed) in rot_meta]
    theta_circ = (jnp.stack(cols, axis=-1) if R else
                  jnp.zeros((B, 0), jnp.float32))            # [B, R]
    theta_eff = (signs * theta_circ[:, None, :]).reshape(B * T, R)

    p1 = evolve_frame_marginals(theta_eff, plan, num_qubits,
                                interpret=interpret)          # [B·T, nq]
    p1 = p1.reshape(B, T, num_qubits)
    # frame X mask: X_q flips the measured bit → p1 ↔ p0
    fxbit = ((fx[..., None] >> jnp.arange(num_qubits)) & 1) \
        .astype(jnp.float32)
    p1 = p1 + fxbit * (1.0 - 2.0 * p1)
    if confusion is not None:
        m = jnp.asarray(confusion, jnp.float32)   # [nq, 2, 2] M[meas, true]
        p1 = m[None, None, :, 1, 0] * (1.0 - p1) \
            + m[None, None, :, 1, 1] * p1
    return 1.0 - 2.0 * p1                                    # <Z_q>


def run_frame_trajectories_z(ct_struct: CircuitTensor,
                             params: jnp.ndarray,
                             choices: jnp.ndarray,
                             num_qubits: int,
                             confusion=None,
                             interpret: bool = False) -> jnp.ndarray:
    """Per-qubit physical ⟨Z_q⟩ (readout applied): [B, T, nq].

    The fused-marginal contract: equivalent to
    ``z_expectations(apply_readout_confusion(run_frame_trajectories_probs(
    …)))`` but the state never leaves the Pallas kernel's VMEM — only the
    sign-folded angle stream goes in and [B, T, nq] marginals come out.
    Exact (not approximate): the frame X mask and per-qubit readout
    confusion both act on per-qubit marginals independently.
    """
    gids = tuple(int(g) for g in np.asarray(ct_struct.gate_ids).reshape(-1))
    qubs = tuple(tuple(int(x) for x in row)
                 for row in np.asarray(ct_struct.qubits).reshape(-1, 2))
    conf = None if confusion is None else np.asarray(confusion, np.float32)
    return _run_frame_marginals(params, choices, conf, gids, qubs,
                                num_qubits, interpret)
