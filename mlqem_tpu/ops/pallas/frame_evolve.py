"""Fused generic Pauli-frame circuit evolution (Pallas, TPU).

The whole unrolled rotation+Clifford circuit runs with the state block
resident in VMEM, and only per-qubit Z marginals leave the kernel:

* Rotations (rx/ry/rz/p/rzz + fixed-angle members) consume a per-trajectory
  SIGN-FOLDED angle streamed as one ``[rows, n_rot]`` input — the Pauli
  frame's anticommutation sign is folded into θ host/XLA-side, so the
  kernel never sees the frame.
* Bit-flip permutations (the X part of rx/ry/h/cx/cy/swap) are lane-axis
  ``pltpu.roll`` pairs combined under the qubit-bit mask:
  ``st[j ^ m] = bit_q(j) ? roll(st, m)[j] : roll(st, -m)[j]`` — no
  lane-splitting reshapes (the Mosaic blocker on this platform) and no
  dim×dim permutation matmuls.
* Diagonals (rz/rzz/cz/s/t/p) are elementwise sign-vector math (VPU).
* The only MXU op is the final marginal contraction
  ``probs [T_b, dim] @ bit [dim, nq]``.

HBM traffic for a whole circuit: the angle stream in, ``[rows, nq]``
marginals out — the state itself never touches HBM (the XLA path writes
and re-reads the full ``[rows, dim]`` state around every unfusable XOR
gather). Replaces the hot path of
:func:`mlqem_tpu.ops.frame_trajectory.run_frame_trajectories_probs`; the
frame-X measurement correction (p1 ↔ p0 per qubit) and readout confusion
both factorize over qubits, so marginals are lossless for the per-qubit
binomial shot pipeline (``parallel/datagen.py``).
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

# op kinds in the static plan (trace-time Python ints, not traced)
ROT_Z, ROT_X, ROT_Y, ROT_ZZ = 0, 1, 2, 3
GATE_H, GATE_CX, GATE_CY, GATE_CZ, GATE_SWAP = 4, 5, 6, 7, 8


@functools.lru_cache(maxsize=32)
def _bit_consts(nq: int) -> Tuple[np.ndarray, np.ndarray]:
    """((-1)^{bit_q(j)} [nq, dim] f32, bit_q(j) [dim, nq] f32)."""
    dim = 1 << nq
    j = np.arange(dim, dtype=np.int64)
    bits = ((j[None, :] >> np.arange(nq)[:, None]) & 1).astype(np.float32)
    return (1.0 - 2.0 * bits), bits.T.copy()


def _evolve_kernel(theta_ref, pm_ref, bit_ref, out_ref, *,
                   plan: Tuple, nq: int):
    """One block of trajectories: unrolled circuit, marginals out.

    theta_ref [T_b, n_rot] sign-folded half-angles NOT yet halved;
    pm_ref [nq, dim] = (−1)^{bit_q(j)}; bit_ref [dim, nq];
    out_ref [T_b, nq] = per-qubit P(outcome 1) in the frame basis.
    """
    tb = theta_ref.shape[0]
    dim = 1 << nq
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, dim), 1)
    re = jnp.where(lane == 0, 1.0, 0.0) * jnp.ones((tb, 1), jnp.float32)
    im = jnp.zeros((tb, dim), jnp.float32)

    def sgn(q):
        return pm_ref[q, :][None, :]                     # [1, dim]

    def bit01(q):
        return 0.5 * (1.0 - sgn(q))                      # [1, dim] 0/1

    def flip(v, q):
        m = 1 << q
        b = bit01(q)
        return pltpu.roll(v, m, 1) * b + pltpu.roll(v, dim - m, 1) * (1.0 - b)

    for kind, a, b, slot in plan:
        if kind in (ROT_Z, ROT_X, ROT_Y, ROT_ZZ):
            th = 0.5 * theta_ref[:, slot][:, None]       # [T_b, 1]
            c = jnp.cos(th)
            s = jnp.sin(th)
            if kind == ROT_Z:
                sv = s * sgn(a)                          # [T_b, dim]
                re, im = re * c + im * sv, im * c - re * sv
            elif kind == ROT_ZZ:
                sv = s * (sgn(a) * sgn(b))
                re, im = re * c + im * sv, im * c - re * sv
            elif kind == ROT_X:
                fr, fi = flip(re, a), flip(im, a)
                re, im = c * re + s * fi, c * im - s * fr
            else:                                        # ROT_Y
                sv = s * sgn(a)
                re, im = c * re - sv * flip(re, a), c * im - sv * flip(im, a)
        elif kind == GATE_H:
            sa = sgn(a)
            inv = np.float32(1.0 / np.sqrt(2.0))
            re, im = ((sa * re + flip(re, a)) * inv,
                      (sa * im + flip(im, a)) * inv)
        elif kind == GATE_CX:
            ctl = bit01(a)
            re = re * (1.0 - ctl) + flip(re, b) * ctl
            im = im * (1.0 - ctl) + flip(im, b) * ctl
        elif kind == GATE_CY:
            ctl = bit01(a)
            sb = sgn(b)
            nre = sb * flip(im, b)
            nim = -sb * flip(re, b)
            re = re * (1.0 - ctl) + nre * ctl
            im = im * (1.0 - ctl) + nim * ctl
        elif kind == GATE_CZ:
            d = 1.0 - 2.0 * bit01(a) * bit01(b)
            re, im = re * d, im * d
        else:                                            # GATE_SWAP
            differ = bit01(a) + bit01(b) - 2.0 * bit01(a) * bit01(b)
            fre = flip(flip(re, a), b)
            fim = flip(flip(im, a), b)
            re = re * (1.0 - differ) + fre * differ
            im = im * (1.0 - differ) + fim * differ

    probs = re * re + im * im
    out_ref[:] = jnp.dot(probs, bit_ref[:],
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("plan", "nq", "block_rows", "interpret"))
def evolve_frame_marginals(theta_eff, plan: Tuple, nq: int,
                           block_rows: int = 512,
                           interpret: bool = False) -> jnp.ndarray:
    """Frame-basis per-qubit P(1): theta_eff [rows, n_rot] → [rows, nq].

    ``plan`` is the static op list: tuple of (kind, a, b, theta_slot).
    Rows whose trajectories share a circuit must already have the
    circuit's angles broadcast (sign-folded per trajectory).
    """
    rows = theta_eff.shape[0]
    dim = 1 << nq
    block_rows = min(block_rows, rows)
    pm, bitT = _bit_consts(nq)
    grid = (pl.cdiv(rows, block_rows),)
    n_rot = max(theta_eff.shape[1], 1)
    if theta_eff.shape[1] == 0:
        theta_eff = jnp.zeros((rows, 1), jnp.float32)

    fn = pl.pallas_call(
        functools.partial(_evolve_kernel, plan=plan, nq=nq),
        out_shape=jax.ShapeDtypeStruct((rows, nq), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, n_rot), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(pm.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(bitT.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, nq), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return fn(theta_eff, jnp.asarray(pm), jnp.asarray(bitT))
