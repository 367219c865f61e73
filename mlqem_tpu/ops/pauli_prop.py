"""Sparse Pauli propagation: 100Q+ noisy TFIM expectation values.

Heisenberg-picture simulation (the Begušić–Chan approach that reproduced
IBM's 127q kicked-Ising experiment): the observable is expanded in the Pauli
basis and conjugated backward through the circuit.

* Clifford gates (CX) remap each Pauli term exactly (16-entry lookup).
* Rotations (RX kick, the RZ inside each bond) split anticommuting terms in
  two (cos/sin branches) — growth is controlled by keeping the top-K terms
  by |coefficient| (`jax.lax.top_k` each layer; discarded weight is
  tracked as an error estimate).
* Pauli noise (the twirled device channels) is DIAGONAL here: each term is
  scaled by f = Σ_p prob_p·(±1), a pure per-term damping — which is what
  makes noisy 100Q simulation tractable at all.
* ⟨0…0|P|0…0⟩ = 1 for X-free terms, else 0 → the expectation is one masked
  coefficient sum.

Terms are bitmask words (uint32[K, W], W = ⌈n/32⌉) + float32 coefficients —
everything is fixed-shape JAX ops, so a J-sweep at 100 qubits is one
compiled program.
"""
from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..device.model import DeviceModel
from ..device.noise import NoiseModel

# ---------------------------------------------------------------------------
# host-side lookup tables (local 2q Pauli algebra)
# local code per qubit: 0=I, 1=X, 2=Y, 3=Z  (x-bit = code∈{1,2},
# z-bit = code∈{2,3}); 2q code = 4·code_a + code_b
# ---------------------------------------------------------------------------
_P1 = [np.eye(2), np.array([[0, 1], [1, 0]]),
       np.array([[0, -1j], [1j, 0]]), np.diag([1, -1])]


def _code_mat(c2):
    a, b = divmod(c2, 4)
    return np.kron(_P1[a], _P1[b])


def _find_code_sign(m):
    for c in range(16):
        ref = _code_mat(c)
        for sign in (1, -1, 1j, -1j):
            if np.allclose(m, sign * ref, atol=1e-9):
                return c, sign
    raise ValueError("not a Pauli")


def _cx_conj_table() -> Tuple[np.ndarray, np.ndarray]:
    """CX·P·CX for the 16 local codes → (new_code[16], sign[16])."""
    cx = np.eye(4)[[0, 1, 3, 2]]
    codes = np.zeros(16, np.int32)
    signs = np.zeros(16, np.float32)
    for c in range(16):
        m = cx @ _code_mat(c) @ cx
        nc, s = _find_code_sign(m)
        assert s in (1, -1)
        codes[c], signs[c] = nc, np.real(s)
    return codes, signs


def _zz_mult_table() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For A = Z⊗Z: anticommute[16], and i·A·P = sign·(new code).

    Returns (anti[16] bool, new_code[16], real_sign[16]) — valid where anti.
    """
    A = _code_mat(4 * 3 + 3)
    anti = np.zeros(16, bool)
    new_code = np.zeros(16, np.int32)
    sign = np.zeros(16, np.float32)
    for c in range(16):
        P = _code_mat(c)
        if np.allclose(A @ P, P @ A):
            continue
        anti[c] = True
        m = 1j * A @ P
        nc, s = _find_code_sign(m)
        assert s in (1, -1), s
        new_code[c], sign[c] = nc, np.real(s)
    return anti, new_code, sign


def _axis_mult_table(A) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For a 1q axis A: anticommute[4], i·A·P = sign·new code."""
    anti = np.zeros(4, bool)
    new_code = np.zeros(4, np.int32)
    sign = np.zeros(4, np.float32)
    for c in range(4):
        P = _P1[c]
        if np.allclose(A @ P, P @ A):
            continue
        anti[c] = True
        m = 1j * A @ P
        for cc in range(4):
            for s in (1, -1, 1j, -1j):
                if np.allclose(m, s * _P1[cc], atol=1e-9):
                    new_code[c], sign[c] = cc, np.real(s)
    return anti, new_code, sign


_CX_CODES, _CX_SIGNS = _cx_conj_table()
_ZZ_ANTI, _ZZ_NEW, _ZZ_SIGN = _zz_mult_table()
_X_ANTI, _X_NEW, _X_SIGN = _axis_mult_table(_P1[1])
_Z_ANTI, _Z_NEW, _Z_SIGN = _axis_mult_table(_P1[3])


# ---------------------------------------------------------------------------
# term-set primitives (jit)
# ---------------------------------------------------------------------------
def _get_bit(words, q):
    return (words[:, q // 32] >> (q % 32)) & 1


def _set_bit_val(words, q, val):
    w = q // 32
    mask = jnp.left_shift(jnp.uint32(1),
                          jnp.asarray(q % 32, jnp.uint32))
    cur = words[:, w]
    new = jnp.where(val.astype(bool), cur | mask,
                    cur & ~mask).astype(jnp.uint32)
    return words.at[:, w].set(new)


def local_code(x, z, q):
    xb = _get_bit(x, q).astype(jnp.int32)
    zb = _get_bit(z, q).astype(jnp.int32)
    # (x,z): (0,0)→I=0, (1,0)→X=1, (1,1)→Y=2, (0,1)→Z=3
    return jnp.where(xb == 1, jnp.where(zb == 1, 2, 1),
                     jnp.where(zb == 1, 3, 0))


def _write_code(x, z, q, code):
    xb = ((code == 1) | (code == 2)).astype(jnp.uint32)
    zb = ((code == 2) | (code == 3)).astype(jnp.uint32)
    return _set_bit_val(x, q, xb), _set_bit_val(z, q, zb)


@dataclasses.dataclass
class TermSet:
    """Fixed-capacity sparse Pauli sum: bit-words + coefficients."""

    x: jnp.ndarray       # uint32[K, W]
    z: jnp.ndarray       # uint32[K, W]
    coeff: jnp.ndarray   # float32[K] (0 = empty slot)


def conj_cx(ts: TermSet, a: int, b: int) -> TermSet:
    code = 4 * local_code(ts.x, ts.z, a) + local_code(ts.x, ts.z, b)
    new_code = jnp.asarray(_CX_CODES)[code]
    sign = jnp.asarray(_CX_SIGNS)[code]
    x, z = _write_code(ts.x, ts.z, a, new_code // 4)
    x, z = _write_code(x, z, b, new_code % 4)
    return TermSet(x, z, ts.coeff * sign)


def damp_pauli_channel(ts: TermSet, a: int, b: int,
                       f_local: jnp.ndarray) -> TermSet:
    """Scale each term by the channel's damping factor f_local[16]
    (indexed by the term's local code at (a, b))."""
    code = 4 * local_code(ts.x, ts.z, a) + local_code(ts.x, ts.z, b)
    return TermSet(ts.x, ts.z, ts.coeff * f_local[code])


def _split(ts: TermSet, anti, new_sign, cos_t, sin_t,
           write_codes, K: int) -> Tuple[TermSet, jnp.ndarray]:
    """Generic rotation split + top-K compaction.

    anti[K] bool; surviving branch coeff·cosθ (where anti) else coeff;
    new branch coeff·sinθ·sign with codes written; keep top-K by |coeff|.
    Returns (new TermSet, discarded weight).
    """
    keep_coeff = jnp.where(anti, ts.coeff * cos_t, ts.coeff)
    new_coeff = jnp.where(anti, ts.coeff * sin_t * new_sign, 0.0)
    x2, z2 = write_codes
    x_all = jnp.concatenate([ts.x, x2])
    z_all = jnp.concatenate([ts.z, z2])
    c_all = jnp.concatenate([keep_coeff, new_coeff])
    mag = jnp.abs(c_all)
    _, idx = jax.lax.top_k(mag, K)
    total = jnp.sum(mag)
    kept = jnp.sum(mag[idx])
    return (TermSet(x_all[idx], z_all[idx], c_all[idx]), total - kept)


def rot_zz(ts: TermSet, a: int, b: int, theta, K: int):
    """Conjugate through RZZ(θ) on (a,b): split anticommuting terms."""
    code = 4 * local_code(ts.x, ts.z, a) + local_code(ts.x, ts.z, b)
    anti = jnp.asarray(_ZZ_ANTI)[code]
    nc = jnp.asarray(_ZZ_NEW)[code]
    sgn = jnp.asarray(_ZZ_SIGN)[code]
    x2, z2 = _write_code(ts.x, ts.z, a, nc // 4)
    x2, z2 = _write_code(x2, z2, b, nc % 4)
    return _split(ts, anti, sgn, jnp.cos(theta), jnp.sin(theta),
                  (x2, z2), K)


def rot_x(ts: TermSet, q: int, theta, K: int):
    """Conjugate through RX(θ) on q."""
    code = local_code(ts.x, ts.z, q)
    anti = jnp.asarray(_X_ANTI)[code]
    nc = jnp.asarray(_X_NEW)[code]
    sgn = jnp.asarray(_X_SIGN)[code]
    x2, z2 = _write_code(ts.x, ts.z, q, nc)
    return _split(ts, anti, sgn, jnp.cos(theta), jnp.sin(theta),
                  (x2, z2), K)


def rot_z(ts: TermSet, q: int, theta, K: int):
    """Conjugate through RZ(θ) on q."""
    code = local_code(ts.x, ts.z, q)
    anti = jnp.asarray(_Z_ANTI)[code]
    nc = jnp.asarray(_Z_NEW)[code]
    sgn = jnp.asarray(_Z_SIGN)[code]
    x2, z2 = _write_code(ts.x, ts.z, q, nc)
    return _split(ts, anti, sgn, jnp.cos(theta), jnp.sin(theta),
                  (x2, z2), K)


def expectation_zero_state(ts: TermSet) -> jnp.ndarray:
    """⟨0…0|Σ c_i P_i|0…0⟩ = Σ of coefficients of X-free terms."""
    x_free = jnp.all(ts.x == 0, axis=1)
    return jnp.sum(jnp.where(x_free, ts.coeff, 0.0))


# ---------------------------------------------------------------------------
# the kicked-Ising Heisenberg engine
# ---------------------------------------------------------------------------
# Empirical axon-TPU budget: one program whose total term-row count
# (batch × observable-qubits × K) exceeds ~2^18 hard-crashes the TPU
# worker ("kernel fault" — the giant batched top_k/sort). Probed 2026-08:
# 3·65536 and 1·262144 run, 5·65536 and 1·524288 kill the worker.
# _run_stepwise chunks host-side so every device call stays under this.
_ROW_BUDGET = 262144


@functools.lru_cache(maxsize=None)
def _compiled_stepwise(nq: int, steps: int, K: int, W: int):
    """One jitted stepwise propagation program per (nq, steps, K).

    Module-level cache (not per-engine): engine instances that differ only
    in their noise model / noise factor share the executable — the damping
    tables are a traced argument ``f_rev`` [n_bonds, 16] in backward bond
    order (all-ones = ideal arm), and the observable qubits are a traced
    int32 argument (jit re-specializes only on the CHUNK SHAPE, so every
    arm and every qubit set reuses one executable per shape).
    """
    even = [(q, q + 1) for q in range(0, nq - 1, 2)]
    odd = [(q, q + 1) for q in range(1, nq - 1, 2)]
    bonds = even + odd
    bonds_rev_np = np.asarray(bonds[::-1], np.int32)

    def propagate(qubit, theta_j, theta_h, f_rev):
        qubit = jnp.asarray(qubit, jnp.int32)
        x = jnp.zeros((K, W), jnp.uint32)
        z = jnp.zeros((K, W), jnp.uint32)
        bit = jnp.left_shift(jnp.uint32(1), (qubit % 32).astype(jnp.uint32))
        z = z.at[0, qubit // 32].set(bit)
        coeff = jnp.zeros((K,), jnp.float32).at[0].set(1.0)
        bonds_rev = jnp.asarray(bonds_rev_np)

        def bond_step(carry, inp):
            x, z, c, disc = carry
            ab, f = inp
            a, b = ab[0], ab[1]
            ts = TermSet(x, z, c)
            # forward: cx1 → noise1 → rz(θ_j, b) → cx2 → noise2; the
            # backward (adjoint) order is the exact reverse — in particular
            # noise1's damping applies to the observable as conjugated to
            # its own site, i.e. BEFORE conjugating through cx1
            ts = damp_pauli_channel(ts, a, b, f)      # noise2
            ts = conj_cx(ts, a, b)                    # cx2
            ts, d = rot_z(ts, b, theta_j, K)          # rz
            ts = damp_pauli_channel(ts, a, b, f)      # noise1
            ts = conj_cx(ts, a, b)                    # cx1
            return (ts.x, ts.z, ts.coeff, disc + d), None

        def kick_step(carry, q):
            x, z, c, disc = carry
            ts, d = rot_x(TermSet(x, z, c), q, theta_h, K)
            return (ts.x, ts.z, ts.coeff, disc + d), None

        qubits_rev = jnp.arange(nq - 1, -1, -1, dtype=jnp.int32)

        def trotter_step_out(carry, _):
            carry, _ = jax.lax.scan(bond_step, carry, (bonds_rev, f_rev))
            carry, _ = jax.lax.scan(kick_step, carry, qubits_rev)
            x, z, c, disc = carry
            return carry, (expectation_zero_state(TermSet(x, z, c)), disc)

        init = (x, z, coeff, jnp.float32(0.0))
        _, (vals, discs) = jax.lax.scan(
            trotter_step_out, init, None, length=steps)
        # per-Trotter-step expectation + cumulative discarded weight so one
        # compiled program serves every depth ≤ steps (step sweeps, and the
        # truncation K-convergence audit)
        return vals, discs

    def run(q_arr, theta_j, theta_h, f_rev):
        # vmap over the observable qubits instead of unrolling them: one
        # batched propagation. (The 5x-unrolled program at K>=65536
        # hard-crashes the axon TPU worker; the batched form is also the
        # better mapping — [Q, K] sorts batch onto the chip.)
        vals, errs = jax.vmap(propagate, in_axes=(0, None, None, None))(
            q_arr, theta_j, theta_h, f_rev)
        # [Q, steps] each → [steps, nq']
        return vals.T, errs.T

    return jax.jit(jax.vmap(run, in_axes=(None, 0, None, None)))


class PauliPropagatorIsing:
    """Noisy ⟨Z_q⟩ for the TFIM Trotter family at 100Q+ via Pauli
    propagation with twirled device noise.

    Noise (optional) damps terms at each physical CX site; ``noise_scale``
    amplifies every damping exponent (the ZNE noise-factor knob: local
    2q folding at factor nf applies each CX channel nf times → f^nf).
    """

    def __init__(self, device: DeviceModel, nq: int, steps: int,
                 dt: float = 0.25, h: float = 1.0,
                 max_terms: int = 4096,
                 noise_model: Optional[NoiseModel] = None,
                 noise: bool = True,
                 readout: bool = True):
        self.nq, self.steps, self.dt, self.h = nq, steps, dt, h
        self.K = max_terms
        self.W = (nq + 31) // 32
        self.device = device
        nm = (noise_model or NoiseModel.from_device(device)) if noise \
            else None
        self._nm = nm
        from .trajectory import pauli_channel_probs

        # commutation-sign table: w[P_code, Q_code] for damping factors
        w = np.zeros((16, 16), np.float32)
        for pc in range(16):
            Pm = _code_mat(pc)
            for qc in range(16):
                Qm = _code_mat(qc)
                w[pc, qc] = 1.0 if np.allclose(Pm @ Qm, Qm @ Pm) else -1.0
        even = [(q, q + 1) for q in range(0, nq - 1, 2)]
        odd = [(q, q + 1) for q in range(1, nq - 1, 2)]
        self.bonds = even + odd
        self._f_local: Dict[Tuple[int, int], np.ndarray] = {}
        for (a, b) in self.bonds:
            if nm is None:
                self._f_local[(a, b)] = np.ones(16, np.float32)
                continue
            chan = nm.channel_for("cx", (a, b))
            if chan is None:
                self._f_local[(a, b)] = np.ones(16, np.float32)
            else:
                probs = pauli_channel_probs(chan).astype(np.float32)
                self._f_local[(a, b)] = w @ probs   # f_P = Σ_q p_q·w(P,q)
        self._readout = None
        if readout and nm is not None and nm.readout is not None:
            self._readout = nm.readout[:nq]

    def _run_stepwise(self, J_values, noise_scale, qubits
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Raw per-step values/discards: ([B, steps, nq'], [B, steps, nq']).

        The per-bond damping tables enter the compiled program as an
        ARGUMENT with the amplification power applied host-side (sign-aware
        integer power: Pauli fidelities can be negative, so (-f)^k keeps
        exact odd/even semantics), and the observable qubits are a traced
        argument too — ONE compiled program per (nq, steps, K, chunk shape)
        serves the ideal arm, every noise factor, every noise model, and
        every qubit set. That matters on the axon tunnel, where each
        compile costs 20-500s. Work is chunked over (batch, qubits) so no
        single device call exceeds ``_ROW_BUDGET`` total term rows (the
        axon worker hard-crashes above ~2^18).
        """
        noise_scale = int(round(noise_scale))
        fn = _compiled_stepwise(self.nq, self.steps, self.K, self.W)
        f_rev = np.stack([self._f_local[b] for b in self.bonds[::-1]])
        f_pow = np.sign(f_rev) ** noise_scale * \
            np.abs(f_rev) ** noise_scale if noise_scale != 1 else f_rev
        f_dev = jnp.asarray(f_pow.astype(np.float32))
        theta_np = -2.0 * self.dt * np.asarray(J_values, np.float32)
        theta_h = jnp.float32(2.0 * self.h * self.dt)
        q_np = np.asarray(qubits, np.int32)
        B, Q = len(theta_np), len(q_np)

        # chunk so every device call stays under the axon row budget
        # (see _ROW_BUDGET); chunks are PADDED to one fixed shape so a
        # whole sweep reuses a single executable per (Bc, Qc)
        Qc = max(1, min(Q, _ROW_BUDGET // self.K))
        Bc = max(1, min(B, _ROW_BUDGET // (self.K * Qc)))
        vals = np.empty((B, self.steps, Q), np.float32)
        errs = np.empty((B, self.steps, Q), np.float32)
        for b0 in range(0, B, Bc):
            th = theta_np[b0:b0 + Bc]
            nb = len(th)
            if nb < Bc:
                th = np.concatenate([th, np.repeat(th[-1:], Bc - nb)])
            for q0 in range(0, Q, Qc):
                qs = q_np[q0:q0 + Qc]
                nq_ = len(qs)
                if nq_ < Qc:
                    qs = np.concatenate([qs, np.repeat(qs[-1:], Qc - nq_)])
                v, e = fn(jnp.asarray(qs), jnp.asarray(th), theta_h, f_dev)
                vals[b0:b0 + nb, :, q0:q0 + nq_] = \
                    np.asarray(v)[:nb, :, :nq_]
                errs[b0:b0 + nb, :, q0:q0 + nq_] = \
                    np.asarray(e)[:nb, :, :nq_]
        if self._readout is not None:
            p = np.array([self._readout[q][1, 0] + self._readout[q][0, 1]
                          for q in qubits], np.float32) / 2.0
            vals = vals * (1.0 - 2.0 * p)[None, None, :]
        return vals, np.asarray(errs)

    def generate(self, J_values: np.ndarray, noise_scale: float = 1.0,
                 qubits: Optional[Sequence[int]] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """(values[B, len(qubits)], discarded_weight[B, len(qubits)]).

        Noisy per-qubit ⟨Z_q⟩ after all Trotter steps (readout applied
        analytically: z → (1-2p_q)·z for symmetric assignment error).
        """
        qubits = list(qubits) if qubits is not None else list(range(self.nq))
        vals, errs = self._run_stepwise(J_values, noise_scale, qubits)
        return vals[:, -1, :], errs[:, -1, :]

    def generate_stepwise(self, J_values: np.ndarray,
                          noise_scale: float = 1.0,
                          qubits: Optional[Sequence[int]] = None
                          ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-Trotter-step values from ONE compiled program.

        Returns (values[B, steps, nq'], cumulative_discard[B, steps, nq']) —
        step s (0-indexed) is the state after s+1 Trotter steps. One
        propagation serves a whole depth sweep (the hardware campaigns
        sweep depth 1..10), and the truncation audit reads the per-step
        drift directly.
        """
        qubits = list(qubits) if qubits is not None else list(range(self.nq))
        return self._run_stepwise(J_values, noise_scale, qubits)
