"""Static-structure density-matrix engine (template batches).

For shared-topology circuit batches (the template pipelines) every op's
qubit pair is static, so the 16×16 superoperator applies with pure
reshape/einsum — the density matrix's row and column target bits become
explicit size-2 axes and the contraction is one batched matmul per op, with
no dynamic gathers. This accelerates the *exactness* path (the generic
engine in :mod:`mlqem_tpu.ops.density` stays for heterogeneous batches).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.circuit import CircuitTensor
from .static_sv import static_pairs
from .unitaries import COMPLEX_DTYPE, op_unitaries

_PERM_SWAP = np.array([0, 2, 1, 3])


def _perm_16(swap_row: bool) -> np.ndarray:
    """Permutation of the 16 superop indices when (a > b) ordering flips."""
    if not swap_row:
        return np.arange(16)
    # k = 4p + q with p, q ∈ {0..3}: permute p and q by [0,2,1,3]
    out = np.zeros(16, np.int64)
    for p in range(4):
        for q in range(4):
            out[4 * p + q] = 4 * _PERM_SWAP[p] + _PERM_SWAP[q]
    return out


def apply_superop_static(dm: jnp.ndarray, s16: jnp.ndarray, a: int, b: int,
                         n: int, variant: str = "einsum") -> jnp.ndarray:
    """Apply a 16×16 superop at STATIC qubits (a, b) to dm[..., 2^n, 2^n].

    s16 may carry leading batch dims broadcasting with dm's.

    variant "einsum": direct 8-bit-axis contraction — fine on CPU, but on
    TPU the split ``[…, 2, L]`` minor axes shred the 128-lane tiling (the
    same pathology as ``apply_readout_confusion``'s einsum form inside
    unrolled programs). variant "transpose": gather the four target bit
    axes to the front with ONE transpose, contract the superop as a clean
    ``[16,16] @ [16, dim²/16]`` matmul over a dense minor axis, transpose
    back — ~2 tiled memory passes per op instead of a 64×-padded einsum.
    """
    lo, hi = (a, b) if a < b else (b, a)
    if a < b:
        perm = jnp.asarray(_perm_16(True))
        s16 = s16[..., perm, :][..., :, perm]
    H = 2 ** (n - 1 - hi)
    M = 2 ** (hi - lo - 1)
    L = 2 ** lo
    batch = dm.shape[:-2]
    dim = 2 ** n
    view = dm.reshape(batch + (H, 2, M, 2, L, H, 2, M, 2, L))
    if variant == "einsum":
        s8 = s16.reshape(s16.shape[:-2] + (2, 2, 2, 2, 2, 2, 2, 2))
        # out indices: (A,B) row bits, (C,D) col bits; in: (a,b,c,d)
        new = jnp.einsum("...ABCDabcd,...HaMbLIcJdK->...HAMBLICJDK",
                         s8, view)
        return new.reshape(batch + (dim, dim))
    if variant != "transpose":
        raise ValueError(f"unknown superop variant {variant!r} "
                         "(einsum | transpose | transpose_carry)")
    nb = len(batch)
    o = nb
    # [batch, rowhi, rowlo, colhi, collo, H, M, L, H, M, L]
    axperm = list(range(nb)) + [o + 1, o + 3, o + 6, o + 8,
                                o + 0, o + 2, o + 4, o + 5, o + 7, o + 9]
    moved = jnp.transpose(view, axperm)
    v16 = moved.reshape(batch + (16, (dim * dim) // 16))
    out16 = jnp.einsum("...ij,...jR->...iR", s16, v16)
    back = out16.reshape(batch + (2, 2, 2, 2, H, M, L, H, M, L))
    inv = list(np.argsort(axperm))
    out = jnp.transpose(back, inv)
    return out.reshape(batch + (dim, dim))


def _run_carry(pairs, s16_per_op, B: int, n: int, dtype) -> jnp.ndarray:
    """Permutation-carrying superop sweep: ONE transpose per op.

    The "transpose" variant pays transpose-in + matmul + transpose-back
    per op (~3 full-dm memory passes). Since the op sequence is static,
    the inverse transpose can instead be composed into the NEXT op's
    forward transpose: the dm lives as a [B] + (2,)*(2n) bit-axis array
    whose current axis order is tracked host-side, and each op emits a
    single transpose from the previous op's layout to its own, followed
    by the dense [16, dim²/16] matmul. One inverse transpose at the end
    restores the canonical [B, dim, dim]. Bit-identical to the other
    variants (same contraction, same f32 accumulation order per op).

    Measured on the v5e this is a NEGATIVE result: 8% slower than
    "transpose" (14.03 s vs 12.98 s per 512-circuit bench batch) — XLA
    fuses the transpose round-trip anyway and the carried layouts tile
    worse. Kept as an equality-tested variant, not the default.
    """
    # logical axis id = canonical position: row bit of qubit q sits at
    # n-1-q (qubit 0 = LSB), col bit of q at 2n-1-q
    dim = 2 ** n
    x = jnp.zeros((B, dim * dim), dtype).at[:, 0].set(1.0)
    x = x.reshape((B,) + (2,) * (2 * n))
    order = list(range(2 * n))
    for (a, b), s16 in zip(pairs, s16_per_op):
        lo, hi = (a, b) if a < b else (b, a)
        targets = [n - 1 - hi, n - 1 - lo, 2 * n - 1 - hi, 2 * n - 1 - lo]
        rest = [i for i in order if i not in targets]
        pos = {axid: p for p, axid in enumerate(order)}
        x = jnp.transpose(x, [0] + [1 + pos[t] for t in targets]
                          + [1 + pos[r] for r in rest])
        order = targets + rest
        x16 = x.reshape(B, 16, (dim * dim) // 16)
        x = jnp.einsum("bij,bjR->biR", s16, x16)
        x = x.reshape((B,) + (2,) * (2 * n))
    pos = {axid: p for p, axid in enumerate(order)}
    x = jnp.transpose(x, [0] + [1 + pos[i] for i in range(2 * n)])
    return x.reshape(B, dim, dim)


def run_density_static(ct_struct: CircuitTensor, params: jnp.ndarray,
                       key_ids: np.ndarray, noise_table: np.ndarray,
                       dtype=COMPLEX_DTYPE,
                       variant: Optional[str] = None) -> jnp.ndarray:
    """Noisy density matrices for a template batch: params [B, L, 3].

    key_ids/noise_table as produced by ``compile_noise_table`` on the
    template (shared across the batch). Returns dm [B, 2^n, 2^n].
    ``variant=None`` picks per platform: "transpose" on TPU (dense-lane
    matmul form), "einsum" elsewhere. "transpose_carry" (one transpose
    per op instead of two) is a measured NEGATIVE result on the v5e:
    14.03 s vs 12.98 s per 512-circuit batch at the bench config,
    bit-identical output — XLA already fuses each op's back-transpose
    into the next op's forward transpose, and the carried bit-axis
    layouts tile worse than the canonical [B, dim, dim] round-trip.
    """
    if variant is None:
        from ..utils.platform import on_tpu

        variant = "transpose" if on_tpu() else "einsum"
    n = max(ct_struct.num_qubits, 2)
    pairs = static_pairs(ct_struct)
    keys = np.asarray(key_ids).reshape(-1)
    table = np.asarray(noise_table, np.complex64)
    B = params.shape[0]
    gate_ids = jnp.asarray(ct_struct.gate_ids)
    mats = jax.vmap(lambda p: op_unitaries(gate_ids, p, dtype))(params)
    dim = 2 ** n

    def op_s16(l, a, b):
        u = mats[:, l]                                   # [B, 4, 4]
        s_gate = jnp.einsum("bpa,bqc->bpqac", u,
                            jnp.conj(u)).reshape(B, 16, 16)
        s_noise = jnp.asarray(table[keys[l]])            # [16, 16] const
        s16 = jnp.einsum("ij,bjk->bik", s_noise, s_gate)
        if a < b:  # (a, b) ordering flip — same perm the per-op paths use
            perm = jnp.asarray(_perm_16(True))
            s16 = s16[..., perm, :][..., :, perm]
        return s16

    if variant == "transpose_carry":
        s16s = [op_s16(l, a, b) for l, (a, b) in enumerate(pairs)]
        return _run_carry(pairs, s16s, B, n, dtype)

    dm = jnp.zeros((B, dim, dim), dtype).at[:, 0, 0].set(1.0)
    for l, (a, b) in enumerate(pairs):
        u = mats[:, l]                                   # [B, 4, 4]
        s_gate = jnp.einsum("bpa,bqc->bpqac", u,
                            jnp.conj(u)).reshape(B, 16, 16)
        s_noise = jnp.asarray(table[keys[l]])            # [16, 16] const
        s16 = jnp.einsum("ij,bjk->bik", s_noise, s_gate)
        dm = apply_superop_static(dm, s16, a, b, n, variant=variant)
    return dm
