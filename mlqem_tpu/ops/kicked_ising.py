"""Kicked-Ising (TFIM Trotter) fast engine: Pauli frames + WHT diagonals.

The benchmark family's structure makes noisy trajectory simulation almost
free on TPU. One Trotter step is

    RX(θh)⊗n  ·  RZZ(θJ) on even bonds  ·  RZZ(θJ) on odd bonds

and under the Pauli-twirled device noise model the only noisy gates are the
CX pairs realizing each RZZ (rz is virtual/noiseless; rx carries no channel
in IBM-style calibrations). Every sampled noise Pauli is commuted through
the *remaining* circuit as a Pauli frame (exact — CX is Clifford; rotations
just flip their angle sign when the frame anticommutes), so a trajectory is
the SAME circuit with per-trajectory ±1 angle signs plus a final Pauli
correction folded into the measurement. The state evolution is then:

* RX layer  = (H⊗n) · diagonal · (H⊗n)  — shared Walsh–Hadamard
  butterflies (pure bandwidth, no per-state data) around a per-trajectory
  diagonal phase,
* RZZ layers = per-trajectory diagonal phases,

with every diagonal's phase exponent computed as one (2^n × sites) ×
(sites × B·T) matmul on the MXU. No gathers, no per-state gate matrices.
This is exact for the twirled noise model (not an extra approximation).
"""
from __future__ import annotations

import dataclasses
import functools
import warnings
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..device.model import DeviceModel
from ..device.noise import NoiseModel
from ..ops.channels import Channel
from ..utils.rng import prng_key
from .unitaries import COMPLEX_DTYPE

_INV_SQRT2 = np.float32(1.0 / np.sqrt(2.0))


def _bonds(nq: int) -> Tuple[List[Tuple[int, int]], List[Tuple[int, int]]]:
    even = [(q, q + 1) for q in range(0, nq - 1, 2)]
    odd = [(q, q + 1) for q in range(1, nq - 1, 2)]
    return even, odd


def wht(state: jnp.ndarray, nq: int) -> jnp.ndarray:
    """H⊗nq over the last amplitude axis [..., 2^n] (n butterfly passes)."""
    batch = state.shape[:-1]
    dim = state.shape[-1]
    for q in range(nq):
        H = dim // (2 ** (q + 1))
        L = 2 ** q
        v = state.reshape(batch + (H, 2, L))
        a = v[..., 0, :]
        b = v[..., 1, :]
        state = jnp.stack([(a + b) * _INV_SQRT2, (a - b) * _INV_SQRT2],
                          axis=-2).reshape(batch + (dim,))
    return state


def wht_mm(state: jnp.ndarray, nq: int, radix: int = 7) -> jnp.ndarray:
    """H⊗nq over the last axis as dense Hadamard MATMULS (MXU path).

    Equal to :func:`wht` but factors H⊗nq into ⌈nq/radix⌉ Kronecker
    slabs of ≤2^radix and contracts each with a dense ±1/√d Hadamard
    constant: ~3 tiled memory passes at nq=21 instead of the butterfly's
    21 strided HBM passes (the light-cone engine's w=21 windows are pure
    bandwidth there). radix=7 keeps each factor at the 128 lane width.
    Complex states split into two float32 matmuls per slab (H is real);
    Precision.HIGHEST keeps the f32 accumulation exact enough for deep
    scans (bf16 MXU passes drift ~1e-2 over 10 Trotter steps).
    """
    parts: List[int] = []
    rem = nq
    while rem > 0:
        c = min(radix, rem)
        parts.append(c)
        rem -= c
    if len(parts) > 8:   # einsum letters below cover ≤8 slabs
        raise ValueError(f"wht_mm supports nq <= {8 * radix} at "
                         f"radix={radix} (got nq={nq}); raise radix or "
                         "use the butterfly wht()")
    batch = state.shape[:-1]
    dims = tuple(2 ** c for c in parts)

    def real_pass(x):
        x = x.reshape(batch + dims)
        k = len(dims)
        letters = "abcdefgh"[:k]
        for i, c in enumerate(parts):
            h = jnp.asarray(_hadamard_dense(c))
            sub = (f"...{letters},{letters[i]}z"
                   f"->...{letters[:i]}z{letters[i + 1:]}")
            x = jnp.einsum(sub, x, h,
                           precision=jax.lax.Precision.HIGHEST)
        return x.reshape(batch + (int(np.prod(dims)),))

    if jnp.iscomplexobj(state):
        return jax.lax.complex(real_pass(jnp.real(state)),
                               real_pass(jnp.imag(state)))
    return real_pass(state)


@functools.lru_cache(maxsize=8)
def _hadamard_dense(nq: int) -> np.ndarray:
    """Dense ±1/√2^n Hadamard [2^n, 2^n] float32 (host constant)."""
    h = np.array([[1.0]], dtype=np.float64)
    for _ in range(nq):
        h = np.block([[h, h], [h, -h]])
    return (h / np.sqrt(2.0 ** nq)).astype(np.float32)


@dataclasses.dataclass
class KickedIsingEngine:
    """Noisy + ideal per-qubit-Z label generator for the TFIM family.

    One compiled program per (nq, steps, n_traj, batch) shape; J varies per
    circuit, noise realizations per trajectory.
    """

    device: DeviceModel
    nq: int
    steps: int
    dt: float = 0.25
    h: float = 1.0
    n_traj: int = 32
    shots: Optional[int] = 10000
    readout: bool = True
    noise_model: Optional[NoiseModel] = None
    # None → auto (Pallas fused kernel on TPU, XLA butterflies elsewhere)
    use_pallas: Optional[bool] = None
    # MXU precision of the in-kernel WHT matmuls: "f32" (Mosaic f32 dot),
    # "bf16_hilo" (hi+lo split vs the ±1 Hadamard — f32-rounding-level
    # accuracy at bf16 MXU rate), "bf16" (lossy speed ceiling)
    wht_mode: str = "f32"
    # Pallas kernel row-block size. 512 measured bit-identical to 256 and
    # ~4x faster at the raw-kernel level on v5e (f32 Mosaic dot at M=256
    # hits a slow path; see docs/perf/probe_kicked_wht.py)
    block_rows: int = 512
    # ZNE noise amplification: each CX channel applied noise_scale times
    # (= local 2q folding at this noise factor). Composition of Pauli
    # channels is f^k in the Walsh domain — computed analytically.
    noise_scale: int = 1

    def __post_init__(self):
        if self.nq > 30:
            raise ValueError("statevector width limit (use the sharded or "
                             "Pauli-propagation engines beyond ~30q)")
        nm = self.noise_model or NoiseModel.from_device(self.device)
        self._nm = nm
        # engine scope: of the gates this family actually uses (rx, rz, cx)
        # only CX may carry noise (IBM-style calibration models attach
        # nothing to the virtual rz / logical rx; sx/x/id channels in the
        # model are unused by this family and therefore harmless)
        touched = ({g for g, _ in nm.local_channels}
                   | set(nm.default_channels))
        conflict = touched & {"rx", "rz", "u3", "ry", "p"}
        if conflict:
            raise ValueError(
                f"KickedIsingEngine models CX+readout noise only; noise "
                f"model attaches channels to {sorted(conflict)} — use the "
                f"generic trajectory or density-matrix engines for those")
        even, odd = _bonds(self.nq)
        self.even_bonds, self.odd_bonds = even, odd
        # per-bond CX twirled Pauli probabilities (two CX per bond per step)
        from .trajectory import pauli_channel_probs

        probs = []
        for (a, b) in even + odd:
            chan = nm.channel_for("cx", (a, b))
            p = (pauli_channel_probs(chan) if chan is not None
                 else np.eye(1, 16, 0)[0])
            if self.noise_scale != 1:
                from .trajectory import compose_pauli_channel

                p = compose_pauli_channel(np.asarray(p, np.float64),
                                          int(self.noise_scale))
            probs.append(p.astype(np.float32))
        self._bond_probs = np.stack(probs)          # [n_bonds, 16]
        ro = nm.readout[:self.nq] if (self.readout and nm.readout
                                      is not None) else None
        self._confusion = None if ro is None else np.asarray(ro, np.float32)
        # precompute diagonal-site matrices (host constants)
        dim = 2 ** self.nq
        j = np.arange(dim)
        bits = ((j[:, None] >> np.arange(self.nq)[None, :]) & 1
                ).astype(np.float32)                # [dim, nq]
        self._bit_pm = 2.0 * bits - 1.0             # ±1 per qubit
        pars = []
        for (a, b) in even + odd:
            pars.append(self._bit_pm[:, a] * self._bit_pm[:, b])
        self._bond_par = np.stack(pars, axis=1)     # [dim, n_bonds] ±1
        self._n_even = len(even)
        self._compiled = {}  # mesh (or None) -> jitted program

    # ------------------------------------------------------------------
    # pass A: Pauli-frame propagation → per-rotation angle signs
    # ------------------------------------------------------------------
    def _frame_signs(self, key, B: int):
        """Sample noise and commute frames to the end.

        Returns (kick_signs[S, BT, nq], bond_signs[S, BT, n_bonds],
        flip[BT, nq]) with S = steps; signs ∈ {±1}; flip = final-frame
        X/Y support (⟨Z_q⟩ sign correction).
        """
        nq = self.nq
        bonds = self.even_bonds + self.odd_bonds
        n_bonds = len(bonds)
        BT = B * self.n_traj
        S = self.steps
        # sample all noise Paulis up front: 2 CX per bond per step
        # (inverse-CDF: categorical would build a [S,BT,nb,2,16] gumbel)
        from .sampling import sample_small_categorical

        draws = sample_small_categorical(
            key, jnp.asarray(self._bond_probs)[None, None, :, None, :],
            (S, BT, n_bonds, 2))                     # [S, BT, n_bonds, 2]
        # pauli code p (0..3 per qubit): x-part p∈{1,2}, z-part p∈{2,3}
        pa = draws // 4
        pb = draws % 4

        def px(p):
            return ((p == 1) | (p == 2)).astype(jnp.uint32)

        def pz(p):
            return ((p == 2) | (p == 3)).astype(jnp.uint32)

        def step_fn(carry, noise_s):
            x, z = carry                             # uint32 [BT]
            pa_s, pb_s = noise_s                     # [BT, n_bonds, 2]
            # kick layer: rx(θh) on all qubits — sign flip iff frame has
            # Z/Y on q (z-bit set)
            kick = 1.0 - 2.0 * jnp.stack(
                [((z >> q) & 1).astype(jnp.float32) for q in range(nq)],
                axis=-1)                              # [BT, nq]
            bond_signs = []
            for k, (a, b) in enumerate(bonds):
                # first CX(a, b): frame conj X_a→X_aX_b, Z_b→Z_aZ_b
                x = x ^ (((x >> a) & 1) << b)
                z = z ^ (((z >> b) & 1) << a)
                # noise Pauli after it
                x = x ^ (px(pa_s[:, k, 0]) << a) ^ (px(pb_s[:, k, 0]) << b)
                z = z ^ (pz(pa_s[:, k, 0]) << a) ^ (pz(pb_s[:, k, 0]) << b)
                # rz(θJ) on target b: flips iff frame has X/Y on b
                bond_signs.append(1.0 - 2.0 * ((x >> b) & 1
                                               ).astype(jnp.float32))
                # second CX(a, b) + its noise
                x = x ^ (((x >> a) & 1) << b)
                z = z ^ (((z >> b) & 1) << a)
                x = x ^ (px(pa_s[:, k, 1]) << a) ^ (px(pb_s[:, k, 1]) << b)
                z = z ^ (pz(pa_s[:, k, 1]) << a) ^ (pz(pb_s[:, k, 1]) << b)
            return (x, z), (kick, jnp.stack(bond_signs, axis=-1))

        x0 = jnp.zeros((BT,), jnp.uint32)
        z0 = jnp.zeros((BT,), jnp.uint32)
        (xf, zf), (kick_signs, bond_signs) = jax.lax.scan(
            step_fn, (x0, z0), (pa, pb))
        flip = jnp.stack([((xf >> q) & 1).astype(jnp.float32)
                          for q in range(nq)], axis=-1)   # [BT, nq]
        return kick_signs, bond_signs, 1.0 - 2.0 * flip

    # ------------------------------------------------------------------
    # pass B: WHT + diagonal evolution
    # ------------------------------------------------------------------
    def _use_pallas(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        try:
            return jax.devices()[0].platform in ("tpu", "axon")
        except Exception:  # pragma: no cover
            return False

    def _evolve_pallas(self, theta_h, theta_j_bt, kick_signs, bond_signs):
        """Fused VMEM-resident evolution (ops/pallas/evolve.py): one HBM
        read + write for ALL Trotter steps. 8.6x the XLA butterfly path on
        v5e at 65536 states x 4 steps."""
        from .pallas.evolve import evolve_fused

        nq = self.nq
        dim = 2 ** nq
        BT = theta_j_bt.shape[0]
        S = self.steps
        nb = len(self.even_bonds) + len(self.odd_bonds)
        # [S, BT, k] → [BT, S·k]
        kick_flat = jnp.swapaxes(kick_signs, 0, 1).reshape(BT, S * nq)
        bond_flat = jnp.swapaxes(bond_signs, 0, 1).reshape(BT, S * nb)
        re = jnp.zeros((BT, dim), jnp.float32).at[:, 0].set(1.0)
        im = jnp.zeros((BT, dim), jnp.float32)
        re, im = evolve_fused(
            re, im, kick_flat, bond_flat,
            theta_j_bt[:, None].astype(jnp.float32),
            jnp.asarray(self._bit_pm.T), jnp.asarray(self._bond_par.T),
            float(theta_h), S, nq, nb, block_rows=self.block_rows,
            wht_mode=self.wht_mode)
        return re * re + im * im

    def _evolve(self, theta_h, theta_j_bt, kick_signs, bond_signs):
        """theta_j_bt [BT]; signs per step; returns probs [BT, dim]."""
        if self._use_pallas():
            return self._evolve_pallas(theta_h, theta_j_bt, kick_signs,
                                       bond_signs)
        if self.wht_mode != "f32":
            # wht_mode drives the in-kernel matmul precision; the XLA
            # butterfly fallback has no equivalent knob, so an engine
            # configured for bf16 would silently run f32 here.
            warnings.warn(
                f"wht_mode={self.wht_mode!r} only affects the Pallas "
                f"kernel; the XLA butterfly path runs f32", stacklevel=2)
        nq = self.nq
        dim = 2 ** nq
        BT = theta_j_bt.shape[0]
        bit_pm = jnp.asarray(self._bit_pm)           # [dim, nq]
        bond_par = jnp.asarray(self._bond_par)       # [dim, n_bonds]
        state = jnp.zeros((BT, dim), COMPLEX_DTYPE).at[:, 0].set(1.0)

        def one_step(state, signs):
            kick, bond = signs                       # [BT, nq], [BT, nb]
            # RX layer: H⊗n · diag(RZ(±θh)) · H⊗n
            state = wht(state, nq)
            expo = (theta_h / 2.0) * (kick @ bit_pm.T)      # [BT, dim]
            state = state * jnp.exp(1j * expo.astype(jnp.float32)
                                    ).astype(state.dtype)
            state = wht(state, nq)
            # ZZ layers: diag(RZZ(±θJ)) — even and odd bonds in one matmul
            expo2 = -(theta_j_bt[:, None] / 2.0) * (bond @ bond_par.T)
            state = state * jnp.exp(1j * expo2.astype(jnp.float32)
                                    ).astype(state.dtype)
            return state, None

        state, _ = jax.lax.scan(one_step, state, (kick_signs, bond_signs))
        return jnp.real(state * jnp.conj(state))

    # ------------------------------------------------------------------
    def _build(self, mesh=None):
        nq, B_traj = self.nq, self.n_traj
        theta_h = 2.0 * self.h * self.dt
        confusion = self._confusion
        shots = self.shots
        shots_per_traj = None if shots is None else max(1,
                                                        shots // B_traj)

        def run(J_values, key):
            B = J_values.shape[0]
            theta_j = (-2.0 * self.dt) * J_values          # [B]
            k_noise, k_shot = jax.random.split(key)
            kick_s, bond_s, zflip = self._frame_signs(k_noise, B)
            # noisy trajectories
            tj_bt = jnp.repeat(theta_j, B_traj)
            probs = self._evolve(theta_h, tj_bt, kick_s, bond_s)
            if confusion is not None:
                from .density import apply_readout_confusion

                probs = apply_readout_confusion(
                    probs, jnp.asarray(confusion), nq)
            bit_pm = jnp.asarray(self._bit_pm)
            z = probs @ (-bit_pm)                          # ⟨Z_q⟩ [BT, nq]
            z = z * zflip                                  # frame correction
            z = z.reshape(B, B_traj, nq)
            if shots is None:
                noisy = jnp.mean(z, axis=1)
            else:
                p1 = jnp.clip((1.0 - z) / 2.0, 0.0, 1.0)
                counts = jax.random.binomial(
                    k_shot, shots_per_traj, p1).astype(jnp.float32)
                noisy = jnp.mean(1.0 - 2.0 * counts / shots_per_traj,
                                 axis=1)
            # ideal labels: same evolution, all signs +1, one "trajectory"
            ones_k = jnp.ones((self.steps, B, nq), jnp.float32)
            ones_b = jnp.ones((self.steps, B,
                               len(self.even_bonds) + len(self.odd_bonds)),
                              jnp.float32)
            probs_i = self._evolve(theta_h, theta_j, ones_k, ones_b)
            ideal = probs_i @ (-bit_pm)
            return ideal, noisy

        if mesh is None:
            return jax.jit(run)
        # multi-chip: shard the circuit batch over the mesh's dp axis —
        # embarrassingly parallel, XLA partitions the whole pipeline
        from ..parallel.mesh import batch_sharding, replicated

        return jax.jit(run,
                       in_shardings=(batch_sharding(mesh),
                                     replicated(mesh)),
                       out_shardings=(batch_sharding(mesh),
                                      batch_sharding(mesh)))

    def generate(self, J_values: np.ndarray, seed: int = 0, mesh=None
                 ) -> Tuple[np.ndarray, np.ndarray]:
        # Compiled programs are keyed on the mesh: a warm-up call without a
        # mesh must not pin later sharded calls to the unsharded program.
        fn = self._compiled.get(mesh)
        if fn is None:
            fn = self._compiled[mesh] = self._build(mesh)
        ideal, noisy = fn(
            jnp.asarray(np.asarray(J_values, np.float32)), prng_key(seed))
        return np.asarray(ideal), np.asarray(noisy)
