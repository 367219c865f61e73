"""Vectorized per-op unitary materialization (jit path).

Given a tensorized circuit ``(gate_ids[L], params[L, 3])`` this produces all
per-op 4x4 unitaries as one ``complex[L, 4, 4]`` array with no Python loop
over ops — every gate kind's matrix is evaluated for all ops at once and the
result is selected by one-hot masking. This keeps the simulator's scan body
branch-free (TPU-friendly: no lax.switch over 30 gate kinds per step).

1q gates are embedded as ``U ⊗ I`` on (first-operand = MSB, partner = LSB),
matching the convention in :mod:`mlqem_tpu.circuits.gates`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.gates import GATE_IDS, NUM_GATE_KINDS

COMPLEX_DTYPE = jnp.complex64


def _kron_u_i(u):
    """kron(U, I2) for U[..., 2, 2] → [..., 4, 4]."""
    eye = jnp.eye(2, dtype=u.dtype)
    out = u[..., :, None, :, None] * eye[None, :, None, :]
    return out.reshape(u.shape[:-2] + (4, 4))


def _controlled(u):
    """diag-block [[I, 0], [0, U]] for U[..., 2, 2] → [..., 4, 4]."""
    batch = u.shape[:-2]
    out = jnp.zeros(batch + (4, 4), dtype=u.dtype)
    out = out.at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    out = out.at[..., 2:, 2:].set(u)
    return out


def _u3(theta, phi, lam, dtype):
    """u3 matrices for angle arrays [...,] → [..., 2, 2]."""
    c = jnp.cos(theta / 2).astype(dtype)
    s = jnp.sin(theta / 2).astype(dtype)
    el = jnp.exp(1j * lam.astype(dtype))
    ep = jnp.exp(1j * phi.astype(dtype))
    row0 = jnp.stack([c, -el * s], axis=-1)
    row1 = jnp.stack([ep * s, ep * el * c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def op_unitaries(gate_ids: jnp.ndarray, params: jnp.ndarray,
                 dtype=COMPLEX_DTYPE) -> jnp.ndarray:
    """All per-op 4x4 unitaries: int32[L], float[L, 3] → complex[L, 4, 4].

    Structural ops and NOP padding produce the identity.
    """
    L = gate_ids.shape[0]
    t = params[:, 0].astype(jnp.float32)
    f = params[:, 1].astype(jnp.float32)
    l = params[:, 2].astype(jnp.float32)
    zeros = jnp.zeros((L,), jnp.float32)

    def c(x):
        return jnp.asarray(x, dtype)

    eye2 = jnp.broadcast_to(c(np.eye(2)), (L, 2, 2))

    # ---- fixed 1q matrices (constant, broadcast) --------------------------
    const1q = {
        "x": np.array([[0, 1], [1, 0]]),
        "y": np.array([[0, -1j], [1j, 0]]),
        "z": np.diag([1, -1]),
        "h": np.array([[1, 1], [1, -1]]) / np.sqrt(2),
        "s": np.diag([1, 1j]),
        "sdg": np.diag([1, -1j]),
        "t": np.diag([1, np.exp(1j * np.pi / 4)]),
        "tdg": np.diag([1, np.exp(-1j * np.pi / 4)]),
        "sx": 0.5 * np.array([[1 + 1j, 1 - 1j], [1 - 1j, 1 + 1j]]),
        "sxdg": 0.5 * np.array([[1 - 1j, 1 + 1j], [1 + 1j, 1 - 1j]]),
    }

    # ---- parametric 1q ------------------------------------------------------
    half = t / 2
    rz = jnp.zeros((L, 2, 2), dtype)
    rz = rz.at[:, 0, 0].set(jnp.exp(-1j * half.astype(dtype)))
    rz = rz.at[:, 1, 1].set(jnp.exp(1j * half.astype(dtype)))
    pgate = jnp.zeros((L, 2, 2), dtype)
    pgate = pgate.at[:, 0, 0].set(1.0)
    pgate = pgate.at[:, 1, 1].set(jnp.exp(1j * t.astype(dtype)))
    rx = _u3(t, zeros - np.pi / 2, zeros + np.pi / 2, dtype)
    ry = _u3(t, zeros, zeros, dtype)
    u2m = _u3(zeros + np.pi / 2, t, f, dtype)
    u3m = _u3(t, f, l, dtype)

    # ---- parametric / fixed 2q ----------------------------------------------
    const2q = {
        "cx": np.block([[np.eye(2), np.zeros((2, 2))],
                        [np.zeros((2, 2)), const1q["x"]]]),
        "cy": np.block([[np.eye(2), np.zeros((2, 2))],
                        [np.zeros((2, 2)), const1q["y"]]]),
        "cz": np.diag([1, 1, 1, -1]),
        "ch": np.block([[np.eye(2), np.zeros((2, 2))],
                        [np.zeros((2, 2)), const1q["h"]]]),
        "swap": np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                          [0, 1, 0, 0], [0, 0, 0, 1]]),
        # ECR(a,b) in a=MSB convention: (X_a⊗I_b - Y_a⊗X_b)/sqrt(2); must
        # match circuits/gates.py:gate_unitary("ecr").
        "ecr": (np.kron(const1q["x"], np.eye(2))
                - np.kron(const1q["y"], const1q["x"])) / np.sqrt(2),
    }

    crz = _controlled(rz)
    cpg = _controlled(pgate)
    cu3 = _controlled(u3m)

    e_m = jnp.exp(-1j * half.astype(dtype))
    e_p = jnp.exp(1j * half.astype(dtype))
    rzz = jnp.zeros((L, 4, 4), dtype)
    rzz = (rzz.at[:, 0, 0].set(e_m).at[:, 1, 1].set(e_p)
           .at[:, 2, 2].set(e_p).at[:, 3, 3].set(e_m))

    cc = jnp.cos(half).astype(dtype)
    ss = jnp.sin(half).astype(dtype)
    rxx = jnp.zeros((L, 4, 4), dtype)
    rxx = (rxx.at[:, 0, 0].set(cc).at[:, 1, 1].set(cc)
           .at[:, 2, 2].set(cc).at[:, 3, 3].set(cc)
           .at[:, 0, 3].set(-1j * ss).at[:, 3, 0].set(-1j * ss)
           .at[:, 1, 2].set(-1j * ss).at[:, 2, 1].set(-1j * ss))
    ryy = jnp.zeros((L, 4, 4), dtype)
    ryy = (ryy.at[:, 0, 0].set(cc).at[:, 1, 1].set(cc)
           .at[:, 2, 2].set(cc).at[:, 3, 3].set(cc)
           .at[:, 0, 3].set(1j * ss).at[:, 3, 0].set(1j * ss)
           .at[:, 1, 2].set(-1j * ss).at[:, 2, 1].set(-1j * ss))

    # ---- assemble by one-hot selection --------------------------------------
    eye4 = jnp.broadcast_to(c(np.eye(4)), (L, 4, 4))

    def sel(name, mat4):
        return jnp.where(
            (gate_ids == GATE_IDS[name])[:, None, None], mat4, 0.0)

    acc = jnp.zeros((L, 4, 4), dtype)
    covered = jnp.zeros((L,), bool)
    pieces = []
    for name, m in const1q.items():
        pieces.append((name, _kron_u_i(jnp.broadcast_to(c(m), (L, 2, 2)))))
    pieces += [
        ("rx", _kron_u_i(rx)), ("ry", _kron_u_i(ry)), ("rz", _kron_u_i(rz)),
        ("p", _kron_u_i(pgate)), ("u2", _kron_u_i(u2m)),
        ("u3", _kron_u_i(u3m)),
        ("crz", crz), ("cp", cpg), ("cu3", cu3),
        ("rzz", rzz), ("rxx", rxx), ("ryy", ryy),
    ]
    for name, m in const2q.items():
        pieces.append((name, jnp.broadcast_to(c(m), (L, 4, 4))))

    for name, mat4 in pieces:
        acc = acc + sel(name, mat4)
        covered = covered | (gate_ids == GATE_IDS[name])

    mats = jnp.where(covered[:, None, None], acc, eye4)
    return mats


def insert_bit(v: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Insert a 0-bit at position ``pos``: (v >> pos << (pos+1)) | low bits."""
    low_mask = (jnp.int32(1) << pos) - 1
    return ((v >> pos) << (pos + 1)) | (v & low_mask)


def pair_indices(a: jnp.ndarray, b: jnp.ndarray, n: int) -> jnp.ndarray:
    """Gather indices for a 2q op at qubits (a, b), a != b.

    Returns int32[4, 2**(n-2)]: row m holds the global indices whose local
    2-bit value is m = 2*v_a + v_b, enumerated over the other n-2 qubits.
    """
    base = jnp.arange(2 ** (n - 2), dtype=jnp.int32)
    p_lo = jnp.minimum(a, b)
    p_hi = jnp.maximum(a, b)
    t = insert_bit(base, p_lo)
    t = insert_bit(t, p_hi)
    bit_a = jnp.int32(1) << a
    bit_b = jnp.int32(1) << b
    return jnp.stack([t, t | bit_b, t | bit_a, t | bit_a | bit_b])


def popcount(v: jnp.ndarray) -> jnp.ndarray:
    """Population count for int32 arrays (SWAR)."""
    v = v.astype(jnp.uint32)
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return ((v * 0x01010101) >> 24).astype(jnp.int32)
