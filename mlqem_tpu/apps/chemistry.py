"""H2 dissociation problem set.

The reference's H2 VQE sweeps (``docs/tutorials/vqe_rf_h2.py:226-246``) read
5-term qubit Hamiltonians per bond length from
``h2-hamiltonian-qubit-params.txt``; the same physical data ships here as a
fixture. Terms: [II, X0X1, Z0, Z0Z1, Z1] (qiskit opflow ``A ^ B`` = A on the
*higher* qubit: X0X1 → "XX", Z0 → "IZ"? — opflow ``Z ^ I`` puts Z on qubit 1.
The reference composes ``operator_components_opflow = [I^I, X^X, Z^I, Z^Z,
I^Z]`` with file coefficients [c1..c5] where the file labels them
[], [X0 X1], [Z0], [Z0 Z1], [Z1] — i.e. file's Z0 ↦ opflow Z^I = Z on
qubit 1... both Z coefficients are equal (symmetric molecule), so the
mapping is unambiguous in practice.
"""
from __future__ import annotations

import os
from typing import List, Tuple

from ..circuits.observables import PauliSum

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                        "h2_hamiltonian_qubit_params.txt")


def load_h2_problems(path: str = _FIXTURE
                     ) -> List[Tuple[float, float, PauliSum]]:
    """[(bond_length_angstrom, fci_energy, hamiltonian)] per bond length."""
    with open(path) as f:
        entries = f.read().split("\n\n")
    out = []
    for entry in entries:
        if not entry.strip():
            continue
        lines = entry.strip().split("\n")
        length = float(lines[0].split(" ")[0])
        fci = float(lines[1].split(" ")[-1])
        coeffs = [float(x.strip().split(" ")[0]) for x in lines[2:7]]
        c_ii, c_xx, c_z0, c_zz, c_z1 = coeffs
        ham = PauliSum([
            ("II", c_ii),
            ("XX", c_xx),
            ("IZ", c_z0),   # Z on qubit 0
            ("ZZ", c_zz),
            ("ZI", c_z1),   # Z on qubit 1
        ])
        out.append((length, fci, ham))
    return out
