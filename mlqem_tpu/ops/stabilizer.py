"""Stabilizer-tableau simulator (Aaronson–Gottesman CHP).

Replaces ``AerSimulator(method='stabilizer')`` for the 100-400q Clifford
scalability sweep (``06_scalability.ipynb``) and provides the analytic
Clifford labels of ``force_nonzero_expectation``
(``docs/tutorials/mbd_utils.py:208-311``).

TPU-native design: the tableau is a pair of bool matrices ``X, Z[2n, n]``
plus sign bits ``r[2n]`` (rows 0..n-1 destabilizers, n..2n-1 stabilizers).
Circuits are decomposed host-side into the {H, S, CX} primitive stream, and
a ``lax.scan`` with a 3-way ``lax.switch`` applies column updates — so a
whole batch of Clifford circuits is one compiled program via ``vmap``.
Pauli expectation values are computed in-tableau (0 / ±1, exact), never via
statevectors.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.circuit import Circuit, Op
from ..circuits.gates import is_structural
from ..circuits.observables import PauliSum

# ---------------------------------------------------------------------------
# Host-side decomposition of Clifford gates into {H, S, CX}
# ---------------------------------------------------------------------------
_PRIM_H, _PRIM_S, _PRIM_CX, _PRIM_NOP = 0, 1, 2, 3

# gate → list of (prim, which_operand(s)) templates; operands refer to the
# op's qubit slots (0 = first, 1 = second)
_CLIFFORD_DECOMP = {
    "id": [],
    "h": [("h", 0)],
    "s": [("s", 0)],
    "sdg": [("s", 0), ("s", 0), ("s", 0)],
    "z": [("s", 0), ("s", 0)],
    "x": [("h", 0), ("s", 0), ("s", 0), ("h", 0)],
    "y": [("s", 0), ("s", 0), ("h", 0), ("s", 0), ("s", 0), ("h", 0)],
    "sx": [("h", 0), ("s", 0), ("h", 0)],
    "sxdg": [("h", 0), ("s", 0), ("s", 0), ("s", 0), ("h", 0)],
    "cx": [("cx", (0, 1))],
    "cz": [("h", 1), ("cx", (0, 1)), ("h", 1)],
    "cy": [("s", 1), ("s", 1), ("s", 1), ("cx", (0, 1)), ("s", 1)],
    "swap": [("cx", (0, 1)), ("cx", (1, 0)), ("cx", (0, 1))],
    # ecr = sdg(a)·sxdg(b)·cx(a,b)·x(a) as an op sequence (x first);
    # verified against the dense unitary in tests
    "ecr": [("h", 0), ("s", 0), ("s", 0), ("h", 0),          # x(a)
            ("cx", (0, 1)),
            ("s", 0), ("s", 0), ("s", 0),                     # sdg(a)
            ("h", 1), ("s", 1), ("s", 1), ("s", 1), ("h", 1)  # sxdg(b)
            ],
}

CLIFFORD_GATES = frozenset(_CLIFFORD_DECOMP)

# Clifford rotation angles (multiples of π/2) for rz/rx/p — used so Trotter
# circuits at Clifford parameter points (h = 0.5π presets) can run at 100q+.
def _try_angle_decomp(name: str, params) -> Optional[List]:
    """Decompose rz/p/rx/ry at multiples of π/2 into Clifford primitives."""
    if name not in ("rz", "p", "rx", "ry"):
        return None
    t = float(params[0])
    k = round(t / (np.pi / 2))
    if abs(t - k * np.pi / 2) > 1e-7:
        return None
    k %= 4
    s_seq = [("s", 0)] * k                      # p(kπ/2) = S^k
    if name == "p":
        return s_seq
    if name == "rz":                            # rz = p up to global phase
        return s_seq
    if name == "rx":                            # rx(θ) = h rz(θ) h
        return [("h", 0)] + s_seq + [("h", 0)]
    # ry(θ) = sdg · rx(θ) · s  (up to global phase)
    sdg = [("s", 0)] * 3
    return sdg + [("h", 0)] + s_seq + [("h", 0), ("s", 0)]


def decompose_to_primitives(circuit: Circuit) -> Tuple[np.ndarray, np.ndarray]:
    """Circuit → (prim_types[L], prim_qubits[L, 2]) in {H, S, CX}."""
    types: List[int] = []
    qubits: List[Tuple[int, int]] = []

    def emit(kind, q0, q1=0):
        types.append({"h": _PRIM_H, "s": _PRIM_S, "cx": _PRIM_CX}[kind])
        qubits.append((q0, q1))

    for op in circuit.ops:
        if is_structural(op.name):
            continue
        decomp = _CLIFFORD_DECOMP.get(op.name)
        if decomp is None:
            decomp = _try_angle_decomp(op.name, op.params)
        if decomp is None:
            raise ValueError(
                f"{op.name}{op.params} is not a Clifford operation")
        for kind, slots in decomp:
            if kind == "cx":
                emit("cx", op.qubits[slots[0]], op.qubits[slots[1]])
            else:
                emit(kind, op.qubits[slots])
    if not types:
        types, qubits = [_PRIM_NOP], [(0, 0)]
    return (np.asarray(types, np.int32), np.asarray(qubits, np.int32))


# ---------------------------------------------------------------------------
# Tableau evolution (jit path)
# ---------------------------------------------------------------------------
def zero_tableau(n: int):
    """|0…0⟩ tableau: destabilizers X_i, stabilizers Z_i."""
    x = jnp.zeros((2 * n, n), bool).at[jnp.arange(n), jnp.arange(n)].set(True)
    z = jnp.zeros((2 * n, n), bool).at[
        jnp.arange(n) + n, jnp.arange(n)].set(True)
    r = jnp.zeros((2 * n,), bool)
    return x, z, r


def _apply_h(tab, q, _q1):
    x, z, r = tab
    xq, zq = x[:, q], z[:, q]
    r = r ^ (xq & zq)
    x = x.at[:, q].set(zq)
    z = z.at[:, q].set(xq)
    return x, z, r


def _apply_s(tab, q, _q1):
    x, z, r = tab
    xq, zq = x[:, q], z[:, q]
    r = r ^ (xq & zq)
    z = z.at[:, q].set(zq ^ xq)
    return x, z, r


def _apply_cx(tab, c, t):
    x, z, r = tab
    xc, xt = x[:, c], x[:, t]
    zc, zt = z[:, c], z[:, t]
    r = r ^ (xc & zt & ~(xt ^ zc))
    x = x.at[:, t].set(xt ^ xc)
    z = z.at[:, c].set(zc ^ zt)
    return x, z, r


def run_tableau(prim_types: jnp.ndarray, prim_qubits: jnp.ndarray, n: int):
    """Evolve the |0…0⟩ tableau through a primitive stream."""
    tab = zero_tableau(n)

    def step(tab, op):
        kind, qp = op
        tab = jax.lax.switch(
            kind,
            [lambda t: _apply_h(t, qp[0], qp[1]),
             lambda t: _apply_s(t, qp[0], qp[1]),
             lambda t: _apply_cx(t, qp[0], qp[1]),
             lambda t: t],
            tab)
        return tab, None

    tab, _ = jax.lax.scan(step, tab,
                          (jnp.asarray(prim_types), jnp.asarray(prim_qubits)))
    return tab


@partial(jax.jit, static_argnames=("n",))
def _run_tableau_jit(prim_types, prim_qubits, n):
    return run_tableau(prim_types, prim_qubits, n)


@partial(jax.jit, static_argnames=("n",))
def _run_tableau_batch(prim_types, prim_qubits, n):
    return jax.vmap(lambda t, q: run_tableau(t, q, n))(prim_types,
                                                       prim_qubits)


# ---------------------------------------------------------------------------
# Pauli expectation in-tableau
# ---------------------------------------------------------------------------
def pauli_expectation_tableau(tab, px: jnp.ndarray, pz: jnp.ndarray,
                              y_count: int, n: int) -> jnp.ndarray:
    """⟨P⟩ on a stabilizer state: exactly 0 or ±1.

    px/pz: bool[n] supports of P (Y → both). The Pauli is
    P = i^{y_count}·Π X^{px} Z^{pz} with + sign.
    """
    x, z, r = tab
    dx, dz = x[:n], z[:n]             # destabilizers
    sx_, sz_ = x[n:], z[n:]           # stabilizers
    sr = r[n:]

    # anticommutation with each stabilizer → if any, ⟨P⟩ = 0
    anti_s = jnp.sum((sx_ & pz[None, :]) ^ (sz_ & px[None, :]),
                     axis=1) % 2
    is_zero = jnp.any(anti_s == 1)

    # coefficients: which stabilizer generators multiply to P —
    # c_i = (P anticommutes with destabilizer i)
    c = (jnp.sum((dx & pz[None, :]) ^ (dz & px[None, :]), axis=1) % 2
         ).astype(bool)

    # accumulate the product Π_i S_i^{c_i} with phase exponent u (mod 4),
    # where a row's operator is i^{2r + y_row}·X^x Z^z
    def body(i, carry):
        u, ax, az = carry
        take = c[i]
        rx_, rz_, rr = sx_[i], sz_[i], sr[i]
        y_row = jnp.sum(rx_ & rz_)
        u_row = 2 * rr.astype(jnp.int32) + y_row
        cross = 2 * jnp.sum(az & rx_)
        u_new = (u + u_row + cross) % 4
        ax_new = ax ^ rx_
        az_new = az ^ rz_
        return (jnp.where(take, u_new, u),
                jnp.where(take, ax_new, ax),
                jnp.where(take, az_new, az))

    u0 = jnp.int32(0)
    ax0 = jnp.zeros((n,), bool)
    az0 = jnp.zeros((n,), bool)
    u, ax, az = jax.lax.fori_loop(0, n, body, (u0, ax0, az0))

    u_p = jnp.int32(y_count % 4)
    diff = (u - u_p) % 4
    sign = jnp.where(diff == 0, 1.0, -1.0)
    return jnp.where(is_zero, 0.0, sign)


# ---------------------------------------------------------------------------
# High-level API
# ---------------------------------------------------------------------------
class StabilizerState:
    """Host-friendly wrapper over an evolved tableau."""

    def __init__(self, tab, n: int):
        self.tab = tab
        self.n = n

    @classmethod
    def from_circuit(cls, circuit: Circuit) -> "StabilizerState":
        types, qubits = decompose_to_primitives(circuit)
        tab = _run_tableau_jit(jnp.asarray(types), jnp.asarray(qubits),
                               circuit.num_qubits)
        return cls(tab, circuit.num_qubits)

    def expectation(self, obs: PauliSum) -> float:
        total = 0.0
        for term in obs.terms:
            codes = term.codes()[: self.n]
            px = jnp.asarray(np.isin(codes, (1, 2)))
            pz = jnp.asarray(np.isin(codes, (2, 3)))
            y_count = int(np.sum(codes == 2))
            total += float(np.real(term.coeff)) * float(
                pauli_expectation_tableau(self.tab, px, pz, y_count, self.n))
        return total

    def stabilizer_strings(self) -> List[str]:
        """Stabilizer generators as ±PAULI strings (qiskit order:
        leftmost char = highest qubit), parity with ``Clifford.to_dict()
        ['stabilizer']`` consumed by ``force_nonzero_expectation``."""
        x, z, r = (np.asarray(t) for t in self.tab)
        out = []
        for i in range(self.n, 2 * self.n):
            chars = []
            for q in reversed(range(self.n)):
                xi, zi = x[i, q], z[i, q]
                chars.append("IXZY"[xi + 2 * zi] if (xi + 2 * zi) != 3
                             else "Y")
            sign = "-" if r[i] else "+"
            out.append(sign + "".join(chars))
        return out


def batch_expectations(circuits: Sequence[Circuit], obs: PauliSum
                       ) -> np.ndarray:
    """⟨P⟩ for a batch of same-shape Clifford circuits (one compiled run)."""
    n = circuits[0].num_qubits
    streams = [decompose_to_primitives(c) for c in circuits]
    max_len = max(s[0].shape[0] for s in streams)
    types = np.full((len(circuits), max_len), _PRIM_NOP, np.int32)
    qubits = np.zeros((len(circuits), max_len, 2), np.int32)
    for i, (t, q) in enumerate(streams):
        types[i, :t.shape[0]] = t
        qubits[i, :q.shape[0]] = q
    tabs = _run_tableau_batch(jnp.asarray(types), jnp.asarray(qubits), n)
    vals = np.zeros(len(circuits))
    for term in obs.terms:
        codes = term.codes()[:n]
        px = jnp.asarray(np.isin(codes, (1, 2)))
        pz = jnp.asarray(np.isin(codes, (2, 3)))
        y_count = int(np.sum(codes == 2))
        f = jax.vmap(lambda tx, tz, tr: pauli_expectation_tableau(
            (tx, tz, tr), px, pz, y_count, n))
        vals += np.real(term.coeff) * np.asarray(f(*tabs))
    return vals


def force_nonzero_expectation(circuit: Circuit, print_bool: bool = False
                              ) -> Tuple[Circuit, int]:
    """Rotate the measurement basis so an all-Z observable has ⟨·⟩ = ±1.

    Parity with ``force_nonzero_expectation_from_clifford_circuit``
    (``mbd_utils.py:208-259``): pick the first stabilizer with no identity
    factor, append basis-change gates per qubit, return (circuit, ±1).
    Raises UserWarning if every stabilizer contains an I.
    """
    state = StabilizerState.from_circuit(circuit)
    stabilizers = state.stabilizer_strings()
    stabilizer = None
    for stab in stabilizers:
        if "I" not in stab:
            stabilizer = stab
            break
    if stabilizer is None:
        raise UserWarning("All of the stabilizers have the identity matrix I!")
    if print_bool:
        print(f"Stabilizer: {stabilizer}")
    out = circuit.copy()
    n = circuit.num_qubits
    for qubit in range(n):
        op = stabilizer[n - qubit]  # char for this qubit (after sign char)
        if op == "X":
            out.h(qubit)
        elif op == "Y":
            out.sdg(qubit)
            out.h(qubit)
    expectation = 1 if stabilizer[0] == "+" else -1
    return out, expectation


def construct_random_clifford(num_qubit: int, depth: int,
                              max_operands: int = 2,
                              seed: Optional[int] = None
                              ) -> Tuple[Circuit, bool]:
    """``construct_random_clifford`` parity (``mbd_utils.py:314-325``)."""
    from ..circuits.families import random_clifford_circuit

    rc = random_clifford_circuit(num_qubit, depth, max_operands, seed)
    try:
        forced, _ = force_nonzero_expectation(rc)
        enforced = True
    except UserWarning:
        forced, enforced = rc, False
    forced.measure_all()
    return forced, enforced


def clifford_inverse_circuit(circuit: Circuit) -> Circuit:
    """Circuit realizing the exact inverse Clifford.

    Implemented as the reversed adjoint op sequence (exact; depth scales
    with the input rather than the single-element inverse of textbook RB —
    functionally equivalent for dataset generation, where only the composed
    identity matters).
    """
    return circuit.inverse()
