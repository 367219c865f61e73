"""Exact light-cone engine: deep TFIM Trotter observables at 100Q+.

The Trotter circuit is strictly local, so the backward (Heisenberg) cone
of a single ``Z_q`` grows by at most ONE qubit per side per Trotter step:
``Z_q`` commutes with every rzz layer until the kick turns it into ``Y_q``,
and each rzz layer then extends the support by one neighbour.  After ``s``
steps ``⟨Z_q⟩`` therefore depends ONLY on the gates inside the window
``[q-s, q+s]`` — simulating that window with open ends is EXACT, not an
approximation: the dropped bonds never touch the Heisenberg support at the
layer where they act, and for stochastic Pauli noise the same argument
holds per trajectory (an inserted Pauli outside the cone commutes with the
backward-propagated observable, so it cancels against its inverse).

At the reference demo's depth 10 (``/root/reference/docs/demos/
demo1_rf_mimic_zne_100q_twirl.ipynb`` runs ``list(range(1, 11))`` Trotter
steps at 100 qubits) the window is ≤ 21 qubits: the ideal arm is ONE exact
statevector evolution per observable, and the noisy/amplified arms are
hardware-protocol trajectory sampling — ``n_traj`` Pauli-twirl instances
(the campaign's 5) × ``shots`` binomial measurements each (the campaign's
10000, ``h31_submit_zne_hardware_100q_twirl``) — with NO truncation
parameter at all.  This is the engine that takes demo1 to the full
published depth, where sparse Pauli propagation's top-K truncation stops
converging (K-doubling audit: step-8/10 drift 0.39/0.76 even at K=131072,
shrinking only ~2.4× per doubling — see
``workflows/demos.py::truncation_convergence``).

Circuit + noise conventions are IDENTICAL to :class:`~.pauli_prop.
PauliPropagatorIsing` and :class:`~.kicked_ising.KickedIsingEngine`
(θ_J = −2·J·dt, θ_h = 2·h·dt; forward step = RX kick, then even bonds,
then odd bonds; each bond = cx → noise → rz(θ_J on target) → cx → noise;
only CX carries twirled channels), verified by the cross-engine tests.
Like the kicked engine, evolution is Pauli frames over a shared
statevector: noise enters as per-trajectory rotation-angle signs plus a
per-step measurement flip, and the per-window twirled channel tables are
TRACED arguments, so one compiled program per window serves the ideal arm
and every ZNE noise factor.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..device.model import DeviceModel
from ..device.noise import NoiseModel
from ..utils.rng import prng_key
from .kicked_ising import wht, wht_mm
from .unitaries import COMPLEX_DTYPE

# window width at and above which the WHT runs as dense Hadamard matmuls
# (wht_mm: ~3 tiled passes on the MXU / BLAS) instead of w strided
# butterfly passes — at the demo's w=21 the butterfly is pure HBM
# bandwidth and the matmul form measures ~3x faster even on 1 CPU core
_WHT_MM_MIN_W = 12


def cone_window(q: int, steps: int, nq: int) -> Tuple[int, int]:
    """(start, width) of the radius-``steps`` cone of qubit ``q``, clamped
    to the chain (width = min(2·steps+1, nq))."""
    w = min(2 * steps + 1, nq)
    start = min(max(q - steps, 0), nq - w)
    return start, w


def readout_affine(confusion: Optional[np.ndarray]) -> Tuple[float, float]:
    """⟨Z⟩ marginal of a column-stochastic confusion C (C[i,j] =
    P(meas=i | true=j)): z_meas = a·z_true + b."""
    if confusion is None:
        return 1.0, 0.0
    C = np.asarray(confusion, np.float64)
    a = (C[0, 0] - C[1, 0] + C[1, 1] - C[0, 1]) / 2.0
    b = (C[0, 0] - C[1, 0] - C[1, 1] + C[0, 1]) / 2.0
    return float(a), float(b)


@dataclasses.dataclass
class LightconeIsing:
    """Stepwise noisy + ideal ⟨Z_q⟩ for the TFIM family at any width.

    One compiled program per observable window (per-window bit tables are
    embedded constants; twirled-channel tables and readout are traced), one
    statevector evolution per (window, arm).  ``shots`` is PER TRAJECTORY
    (hardware semantics: ``n_traj`` error realizations × ``shots`` counts
    each, averaged); ``shots=None`` returns exact per-trajectory values.

    ``t_chunk`` bounds the trajectories resident in one device call (the
    state block is ``[B·t_chunk, 2^w]`` complex64 — 2 GB at t_chunk=128,
    w=21): ``n_traj`` must divide into equal chunks, which run
    sequentially with independent noise keys and average exactly.  This
    is what makes HARDWARE-FAITHFUL realization counts affordable: on
    hardware every one of the campaign's 5×10000 shots samples a fresh
    error realization, so a faithful simulation needs n_traj in the
    hundreds-to-thousands (with ``shots`` split accordingly), not the 5
    twirl-instance count — per-trajectory ⟨Z⟩ spread is 0.15–0.67 across
    the demo's steps, so at n_traj=5 the per-point sampling noise (~0.1)
    drowns the ZNE gap the mimic model is supposed to learn.
    """

    device: DeviceModel
    nq: int
    steps: int
    dt: float = 0.25
    h: float = 1.0
    n_traj: int = 5
    shots: Optional[int] = 10000
    readout: bool = True
    noise_model: Optional[NoiseModel] = None
    noise: bool = True
    t_chunk: Optional[int] = None

    def __post_init__(self):
        if min(2 * self.steps + 1, self.nq) > 32:
            raise ValueError("light-cone window exceeds 32 qubits — "
                             "truncate steps or use sharded engines")
        if self.t_chunk is not None and self.n_traj % self.t_chunk:
            raise ValueError("n_traj must split into equal t_chunk blocks "
                             "(exact chunk-mean averaging)")
        nm = self.noise_model
        if nm is None and self.noise:
            nm = NoiseModel.from_device(self.device)
        self._nm = nm
        self._programs: Dict = {}

    # -- per-window host tables ---------------------------------------------
    def _window_tables(self, q: int):
        """Static + noise tables for qubit ``q``'s window."""
        from .trajectory import pauli_channel_probs

        start, w = cone_window(q, self.steps, self.nq)
        # local bonds in GLOBAL application order (even sublayer first);
        # all windows of one width share shapes, not constants
        even = [(a - start, a + 1 - start) for a in range(0, self.nq - 1, 2)
                if start <= a and a + 1 <= start + w - 1]
        odd = [(a - start, a + 1 - start) for a in range(1, self.nq - 1, 2)
               if start <= a and a + 1 <= start + w - 1]
        bonds = even + odd
        probs = []
        for (la, lb) in bonds:
            chan = None if self._nm is None else \
                self._nm.channel_for("cx", (la + start, lb + start))
            p = (pauli_channel_probs(chan) if chan is not None
                 else np.eye(1, 16, 0)[0])
            probs.append(p.astype(np.float32))
        conf = None
        if (self.readout and self._nm is not None
                and self._nm.readout is not None):
            conf = self._nm.readout[q]
        return {"start": start, "w": w, "obs": q - start, "bonds": bonds,
                "probs": np.stack(probs), "confusion": conf}

    # -- the per-window jitted program --------------------------------------
    def _build(self, tw: Dict):
        w, obs, bonds = tw["w"], tw["obs"], tw["bonds"]
        nb, S = len(bonds), self.steps
        T = self.t_chunk if self.t_chunk is not None else self.n_traj
        theta_h = 2.0 * self.h * self.dt
        shots = self.shots

        from .sampling import sample_small_categorical

        def frame_signs(key, bond_probs, BT):
            """kick_signs [S,BT,w], bond_signs [S,BT,nb], flip [S,BT]
            (flip = the measurement X-support sign AFTER each step)."""
            draws = sample_small_categorical(
                key, bond_probs[None, None, :, None, :], (S, BT, nb, 2))
            pa, pb = draws // 4, draws % 4

            def px(p):
                return ((p == 1) | (p == 2)).astype(jnp.uint32)

            def pz(p):
                return ((p == 2) | (p == 3)).astype(jnp.uint32)

            def step_fn(carry, noise_s):
                x, z = carry
                pa_s, pb_s = noise_s
                kick = 1.0 - 2.0 * jnp.stack(
                    [((z >> qq) & 1).astype(jnp.float32) for qq in range(w)],
                    axis=-1)
                bsigns = []
                for k, (a, b) in enumerate(bonds):
                    x = x ^ (((x >> a) & 1) << b)
                    z = z ^ (((z >> b) & 1) << a)
                    x = x ^ (px(pa_s[:, k, 0]) << a) ^ (px(pb_s[:, k, 0]) << b)
                    z = z ^ (pz(pa_s[:, k, 0]) << a) ^ (pz(pb_s[:, k, 0]) << b)
                    bsigns.append(1.0 - 2.0 * ((x >> b) & 1
                                               ).astype(jnp.float32))
                    x = x ^ (((x >> a) & 1) << b)
                    z = z ^ (((z >> b) & 1) << a)
                    x = x ^ (px(pa_s[:, k, 1]) << a) ^ (px(pb_s[:, k, 1]) << b)
                    z = z ^ (pz(pa_s[:, k, 1]) << a) ^ (pz(pb_s[:, k, 1]) << b)
                flip = 1.0 - 2.0 * ((x >> obs) & 1).astype(jnp.float32)
                return (x, z), (kick, jnp.stack(bsigns, axis=-1), flip)

            zero = jnp.zeros((BT,), jnp.uint32)
            _, (kick_s, bond_s, flip_s) = jax.lax.scan(
                step_fn, (zero, zero), (pa, pb))
            return kick_s, bond_s, flip_s

        def bit_tables(dim):
            """[dim, w] (−1)^{bit_q} and [dim, nb] bond parities, built
            from iota INSIDE jit: at w=21 these are 170MB+ each, so
            embedding them as program constants blows past the remote
            compiler's request-body limit (HTTP 413 on the axon tunnel).
            As uniform-sign (ideal-arm) phase vectors they also must not
            reach a constant-foldable [B, dim] matmul — a multi-minute
            scalar-evaluator stall; the sums below fold linearly."""
            lane = jax.lax.iota(jnp.int32, dim)
            bit_pm = 2.0 * jnp.stack(
                [((lane >> q) & 1).astype(jnp.float32) for q in range(w)],
                axis=1) - 1.0                           # [dim, w]
            bond_par = jnp.stack([bit_pm[:, a] * bit_pm[:, b]
                                  for (a, b) in bonds], axis=1)
            return bit_pm, bond_par

        def evolve_stepwise(theta_j_bt, kick_s, bond_s):
            """Per-step ⟨Z_obs⟩ of the frame-evolved state: [S, BT].

            ``kick_s``/``bond_s`` = ``None`` means uniform +1 signs (the
            ideal arm): the per-step phase exponents collapse to fixed
            [dim] vectors instead of sign matmuls.
            """
            dim = 2 ** w
            BT = theta_j_bt.shape[0]
            wht_fn = wht_mm if w >= _WHT_MM_MIN_W else wht
            bit_pm, bond_par = bit_tables(dim)
            mz = -bit_pm[:, obs]                       # ⟨Z⟩ weights [dim]
            state = jnp.zeros((BT, dim), COMPLEX_DTYPE).at[:, 0].set(1.0)
            uniform = kick_s is None
            if uniform:
                kick_expo = (theta_h / 2.0) * bit_pm.sum(axis=1)   # [dim]
                bond_unit = bond_par.sum(axis=1)                   # [dim]
                xs = jnp.zeros((S,), jnp.float32)
            else:
                xs = (kick_s, bond_s)

            def one_step(state, signs):
                state = wht_fn(state, w)
                if uniform:
                    expo = jnp.broadcast_to(kick_expo[None, :], (BT, dim))
                else:
                    expo = (theta_h / 2.0) * (signs[0] @ bit_pm.T)
                state = state * jnp.exp(
                    1j * expo.astype(jnp.float32)).astype(state.dtype)
                state = wht_fn(state, w)
                if uniform:
                    expo2 = -(theta_j_bt[:, None] / 2.0) * bond_unit[None, :]
                else:
                    expo2 = -(theta_j_bt[:, None] / 2.0) \
                        * (signs[1] @ bond_par.T)
                state = state * jnp.exp(
                    1j * expo2.astype(jnp.float32)).astype(state.dtype)
                probs = jnp.real(state * jnp.conj(state))
                # HIGHEST: TPU default matmul precision rounds the f32
                # probs inputs to bf16 (~4e-3 relative). The sign matmuls
                # above are exact at any precision (±1 entries are
                # bf16-exact, accumulation is f32); this one is not.
                return state, jnp.einsum(
                    "bd,d->b", probs, mz,
                    precision=jax.lax.Precision.HIGHEST)

            _, z_sw = jax.lax.scan(one_step, state, xs)
            return z_sw                                 # [S, BT]

        def run_noisy(theta_j, bond_probs, ro_a, ro_b, key):
            """theta_j [B] → noisy [B, S]."""
            B = theta_j.shape[0]
            BT = B * T
            k_noise, k_shot = jax.random.split(key)
            kick_s, bond_s, flip_s = frame_signs(k_noise, bond_probs, BT)
            tj_bt = jnp.repeat(theta_j, T)
            z_sim = evolve_stepwise(tj_bt, kick_s, bond_s)     # [S, BT]
            # the frame flip is PHYSICAL (it is the noise Pauli's X/Y
            # support commuted to the measurement — the twirl is already
            # absorbed into the channel probabilities, so nothing unflips
            # it): z_phys = flip·z_sim, then readout, then counts
            z_meas = ro_a * (flip_s * z_sim) + ro_b
            if shots is None:
                z_rep = z_meas
            else:
                p1 = jnp.clip((1.0 - z_meas) / 2.0, 0.0, 1.0)
                counts = jax.random.binomial(k_shot, shots, p1
                                             ).astype(jnp.float32)
                z_rep = 1.0 - 2.0 * counts / shots
            return jnp.mean(z_rep.reshape(S, B, T), axis=2).T   # [B, S]

        def run_full(theta_j, bond_probs, ro_a, ro_b, key):
            """theta_j [B] → (noisy [B, S], ideal [B, S])."""
            noisy = run_noisy(theta_j, bond_probs, ro_a, ro_b, key)
            # ideal arm: all signs +1, one trajectory, no readout/shots
            ideal = evolve_stepwise(theta_j, None, None).T       # [B, S]
            return noisy, ideal

        return {"full": jax.jit(run_full), "noisy": jax.jit(run_noisy)}

    # -- public API ----------------------------------------------------------
    def generate_stepwise(self, J_values: np.ndarray,
                          noise_scale: float = 1.0,
                          qubits: Optional[Sequence[int]] = None,
                          seed: int = 0,
                          want_ideal: bool = True,
                          readout_correct: bool = False
                          ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """(noisy [B, steps, Q], ideal [B, steps, Q]) — exact per-step
        ⟨Z_q⟩ through every depth ≤ ``steps``; ``noise_scale`` composes
        each CX channel with itself (the ZNE local-folding knob, same
        semantics as the Pauli-propagation engine).

        ``want_ideal=False`` skips the noise-free arm (returns ``None``
        for it) — the ideal values do not depend on ``noise_scale``, so
        amplified-arm calls should not pay a second exact evolution.

        ``readout_correct=True`` inverts the calibrated readout affine on
        the shot estimates: z ← (z_meas − b)/a per qubit — the IBM
        runtime's TREX readout mitigation (resilience_level ≥ 1, active in
        the reference's 100Q ZNE campaign, ``h31`` Options cells), which
        every demo1 arm receives on hardware. Folding amplifies only the
        CX channels, so WITHOUT this the un-amplified readout bias rides
        through the extrapolation unmitigated (plus 2× variance), and
        simulated ZNE loses to the noisy arm in regimes where hardware
        ZNE wins. The sampled shot noise is still taken on the raw
        (confused) probabilities, then inflated by 1/a — exactly the
        hardware estimator's error propagation.
        """
        from .trajectory import compose_pauli_channel

        qubits = list(qubits) if qubits is not None else list(range(self.nq))
        theta_j = jnp.asarray(-2.0 * self.dt
                              * np.asarray(J_values, np.float32))
        B = theta_j.shape[0]
        noisy = np.empty((B, self.steps, len(qubits)), np.float32)
        ideal = np.empty((B, self.steps, len(qubits)), np.float32) \
            if want_ideal else None
        ns = int(round(noise_scale))
        if abs(noise_scale - ns) > 1e-9:
            raise ValueError(
                f"noise_scale={noise_scale} — channel self-composition "
                "(local folding) only amplifies by integer factors; use "
                "integer ZNE noise factors with this engine")
        for qi, q in enumerate(qubits):
            tw = self._window_tables(q)
            key = (tw["w"], tw["obs"], tuple(tw["bonds"]), B)
            fns = self._programs.get(key)
            if fns is None:
                fns = self._programs[key] = self._build(tw)
            probs = tw["probs"]
            if ns != 1:
                probs = np.stack([compose_pauli_channel(
                    p.astype(np.float64), ns) for p in probs]
                ).astype(np.float32)
            a, b = readout_affine(tw["confusion"])
            base_key = prng_key(seed * 7919 + q * 131 + ns)
            n_chunks = (self.n_traj // self.t_chunk
                        if self.t_chunk is not None else 1)
            probs_j = jnp.asarray(probs)
            outs = []
            i_dev = None
            for tc in range(n_chunks):
                key = base_key if n_chunks == 1 else \
                    jax.random.fold_in(base_key, tc)
                args = (theta_j, probs_j, jnp.float32(a), jnp.float32(b),
                        key)
                # dispatch every chunk before syncing any (the [B, S]
                # outputs are tiny; the big state frees per call) — one
                # host round-trip per window instead of per chunk
                if want_ideal and tc == 0:
                    n, i_dev = fns["full"](*args)
                else:
                    n = fns["noisy"](*args)
                outs.append(n)
            if i_dev is not None:
                ideal[:, :, qi] = np.asarray(i_dev)
            acc = np.asarray(outs[0]).astype(np.float64)
            for n in outs[1:]:
                acc += np.asarray(n)
            noisy[:, :, qi] = acc / n_chunks
            if readout_correct and (a, b) != (1.0, 0.0):
                noisy[:, :, qi] = (noisy[:, :, qi] - b) / a
        return noisy, ideal
