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
from ..circuits.gates import GATE_NAMES, GATE_NUM_QUBITS
from .static_sv import static_pairs
from .unitaries import COMPLEX_DTYPE, op_unitaries

_PERM_SWAP = np.array([0, 2, 1, 3])

# The exactness engine pins true-f32 contractions: JAX's DEFAULT matmul
# precision on TPU computes f32 dots in bf16 passes (~1e-3 relative),
# which is fine for the throughput engines but not for the path whose
# whole job is exact labels. HIGHEST is a no-op on CPU, and on TPU the
# dm path is transpose-bound, not matmul-bound, so the cost is small.
# MLQEM_DM_PRECISION (default | high | highest) is a measurement knob for
# the precision-ladder probe (docs/perf/probe_dm_precision.py) — read once
# at import, so set it before the first mlqem_tpu import.
import os as _os

_PREC = {"default": jax.lax.Precision.DEFAULT,
         "high": jax.lax.Precision.HIGH,
         "highest": jax.lax.Precision.HIGHEST}[
             _os.environ.get("MLQEM_DM_PRECISION", "highest").lower()]

# flat 16-index (= 4·(2Ra+Rb) + (2Ca+Cb)) of the slot-0 subspace with the
# slot-1 bits Rb=Cb=0, ordered by the 1q superop index 2Ra+Ca
_SLOT0_IDX = np.array([0, 2, 8, 10])


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
                         s8, view, precision=_PREC)
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
    out16 = jnp.einsum("...ij,...jR->...iR", s16, v16, precision=_PREC)
    back = out16.reshape(batch + (2, 2, 2, 2, H, M, L, H, M, L))
    inv = list(np.argsort(axperm))
    out = jnp.transpose(back, inv)
    return out.reshape(batch + (dim, dim))


def _factor_slot0(s16: np.ndarray) -> Optional[np.ndarray]:
    """Host-side: the 4×4 S with ``s16 == S ⊗ I`` (slot-0 action), or None.

    ``compile_noise_table`` lifts 1q channels with ``expand_to_2q(0)``
    (identity on the embedding partner), so 1q-op noise superops factor
    this way by construction; the numeric check keeps the fusion pass
    safe against any future channel that does not.
    """
    s4 = s16[np.ix_(_SLOT0_IDX, _SLOT0_IDX)]
    a_r = s4.reshape(2, 2, 2, 2)                 # [Ra, Ca, Ra', Ca']
    eye = np.eye(2)
    lifted = np.einsum("ACac,Bb,Dd->ABCDabcd", a_r, eye, eye).reshape(16, 16)
    return s4 if np.allclose(lifted, s16, atol=1e-12) else None


def _lift_pair(s4a, s4b, B: int, dtype) -> jnp.ndarray:
    """16×16 superop (first, second) from per-slot 4×4 superops.

    ``None`` means identity on that slot. Index convention matches the
    engine throughout: flat = 4·(2Ra+Rb) + (2Ca+Cb).
    """
    eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (B, 4, 4))
    a_r = (eye if s4a is None else s4a).reshape(B, 2, 2, 2, 2)
    b_r = (eye if s4b is None else s4b).reshape(B, 2, 2, 2, 2)
    out = jnp.einsum("zACac,zBDbd->zABCDabcd", a_r, b_r, precision=_PREC)
    return out.reshape(B, 16, 16)


def apply_superop_multi(dm: jnp.ndarray, sK: jnp.ndarray,
                        qs: Tuple[int, ...], n: int) -> jnp.ndarray:
    """Apply a 4^k × 4^k superop at k distinct STATIC qubits to
    dm[..., 2^n, 2^n].

    ``qs`` gives the superop's slot order (slot 0 = MSB of the local
    row/col index), so no index permutation of ``sK`` is ever needed —
    the dm's bit axes are gathered in exactly that order. Same dense-lane
    transpose/matmul form as :func:`apply_superop_static`'s "transpose"
    variant, generalized to k qubits (used by the 4q disjoint-pair plan).
    """
    k = len(qs)
    batch = dm.shape[:-2]
    nb = len(batch)
    dim = 2 ** n
    view = dm.reshape(batch + (2,) * (2 * n))
    row_ax = [nb + (n - 1 - q) for q in qs]
    col_ax = [nb + n + (n - 1 - q) for q in qs]
    front = row_ax + col_ax
    rest = [i for i in range(nb, nb + 2 * n) if i not in front]
    axperm = list(range(nb)) + front + rest
    moved = jnp.transpose(view, axperm)
    v = moved.reshape(batch + (4 ** k, (dim * dim) // 4 ** k))
    out = jnp.einsum("...ij,...jR->...iR", sK, v, precision=_PREC)
    back = out.reshape(moved.shape)
    inv = list(np.argsort(axperm))
    return jnp.transpose(back, inv).reshape(batch + (dim, dim))


def _lift_disjoint(sa: jnp.ndarray, sb: jnp.ndarray, B: int,
                   da: int) -> jnp.ndarray:
    """(4·da)²-dim superop from sa (da²×da², leading slots) and sb
    (16×16, trailing two slots) on disjoint qubits.

    Index convention throughout: flat = D·row + col with row/col the
    slot-major local indices, so the combined flat order is
    (row_a, row_b, col_a, col_b).
    """
    a_r = sa.reshape(B, da, da, da, da)     # [row_a, col_a, row_a', col_a']
    b_r = sb.reshape(B, 4, 4, 4, 4)
    out = jnp.einsum("zACac,zBDbd->zABCDabcd", a_r, b_r, precision=_PREC)
    d = 4 * da
    return out.reshape(B, d * d, d * d)


# forward-scan window for the disjoint pairing pass
_PAIR_SCAN = 32


def pair_disjoint_superops(ops):
    """Pair disjoint-support 16×16 ops into 4-qubit 256×256 superops.

    Input [(a, b, s16)]; output entries are ("s16", a, b, s16) or
    ("s256", qs, s256). Op j merges back to op i's position only when
    every unmerged op between them has support disjoint from op j's
    (commutation), so the composed channel sequence is unchanged. Halves
    the number of full-dm passes on layered bond circuits at 16× the
    (cheap, MXU-friendly M=K=256) matmul FLOPs per pass.
    """
    items = [{"qs": (a, b), "s": s16, "merged": False}
             for a, b, s16 in ops]
    plan = []
    for i, it in enumerate(items):
        if it["merged"]:
            continue
        sup = set(it["qs"])
        paired = False
        blocked: set = set()
        for j in range(i + 1, min(i + 1 + _PAIR_SCAN, len(items))):
            jt = items[j]
            if jt["merged"]:
                continue
            js = set(jt["qs"])
            if js & sup or js & blocked:
                blocked |= js
                continue
            jt["merged"] = True
            B = it["s"].shape[0]
            plan.append(("s256", it["qs"] + jt["qs"],
                         _lift_disjoint(it["s"], jt["s"], B, 4)))
            paired = True
            break
        if not paired:
            plan.append(("s16", it["qs"][0], it["qs"][1], it["s"]))
    return plan


# backward-scan window for the disjoint-commutation merge (compile-time
# bound; real circuits block within a few ops via shared support)
_MERGE_SCAN = 64


def fuse_superops(pairs, gate_ids, keys, table, mats, B: int, n: int,
                  dtype) -> List[Tuple[int, int, jnp.ndarray]]:
    """Fused per-op superop plan: [(a, b, s16[B, 16, 16])] in (first,
    second) slot order, applying the SAME channel sequence as the
    one-superop-per-slot path with far fewer full-dm passes.

    Exact transformations only (the composed linear maps are identical up
    to float reassociation):

    - **NOP skip**: padding slots (gate 0, noise key 0) are identity
      superops — dropped instead of costing a full dm pass each.
    - **1q absorption**: a 1q op's superop factors as S4 ⊗ I (unitary
      U ⊗ I by the embedding convention, noise ``expand_to_2q(0)`` —
      host-verified by :func:`_factor_slot0`), so it accumulates into a
      per-qubit pending 4×4 and composes into the next emitted op that
      touches the qubit. Channels on disjoint qubits commute, so the
      deferral is exact.
    - **Disjoint-commutation merge**: an emitted op merges into the most
      recent emitted op on the SAME qubit set when every emitted op in
      between has disjoint support (e.g. the cx–rz–cx sandwich of a
      lowered rzz becomes ONE 16×16 after the rz absorbs).

    On the bench Ising template (10q, 4 Trotter steps: 148 slots = 76
    absorbable 1q + 72 cx) this plan emits 41 superops — each full-dm
    pass is the cost unit, so the exactness path speeds up ~3.6× with
    bit-equal physics (measured ≤1e-6 from reassociation).
    """
    gate_ids = np.asarray(gate_ids).reshape(-1)
    pending: dict = {}                    # qubit -> s4 [B, 4, 4]
    emitted: List[list] = []              # [a, b, support, s16]
    swap_perm = _perm_16(True)

    def emit(a: int, b: int, s16) -> None:
        for e in reversed(emitted[-_MERGE_SCAN:]):
            if e[2] == {a, b}:
                if (e[0], e[1]) != (a, b):   # align slot order to e's
                    s16 = s16[:, swap_perm, :][:, :, swap_perm]
                e[3] = jnp.einsum("bij,bjk->bik", s16, e[3], precision=_PREC)
                return
            if e[2] & {a, b}:
                break
        emitted.append([a, b, {a, b}, s16])

    for l, (a, b) in enumerate(pairs):
        g = int(gate_ids[l])
        key = int(keys[l])
        if g == 0 and key == 0:
            continue                      # identity superop: skip the pass
        name = GATE_NAMES[g] if 0 <= g < len(GATE_NAMES) else ""
        is1q = GATE_NUM_QUBITS.get(name, 1) == 1
        s4n = None
        if is1q and key != 0:
            s4n = _factor_slot0(np.asarray(table[key], np.complex128))
        if is1q and (key == 0 or s4n is not None):
            u = mats[:, l, 0::2, 0::2]    # U from the U ⊗ I embedding
            s4 = jnp.einsum("bpa,bqc->bpqac", u,
                            jnp.conj(u), precision=_PREC).reshape(B, 4, 4)
            if s4n is not None:
                s4 = jnp.einsum("ij,bjk->bik",
                                jnp.asarray(s4n.astype(np.complex64),
                                            dtype), s4)
            p = pending.get(a)
            pending[a] = s4 if p is None else jnp.einsum(
                "bij,bjk->bik", s4, p, precision=_PREC)
            continue
        u4 = mats[:, l]                   # 2q (or unfactorable-noise) op
        s16 = jnp.einsum("bpa,bqc->bpqac", u4,
                         jnp.conj(u4), precision=_PREC).reshape(B, 16, 16)
        if key != 0:
            s16 = jnp.einsum("ij,bjk->bik",
                             jnp.asarray(table[key]), s16, precision=_PREC)
        pa, pb = pending.pop(a, None), pending.pop(b, None)
        if pa is not None or pb is not None:
            s16 = jnp.einsum("bij,bjk->bik", s16,
                             _lift_pair(pa, pb, B, dtype), precision=_PREC)
        emit(a, b, s16)

    left = sorted(pending)                # trailing 1q layers, pairwise
    while left:
        qa = left.pop(0)
        if left:
            qb = left.pop(0)
            emit(qa, qb, _lift_pair(pending[qa], pending[qb], B, dtype))
        else:
            qb = (qa + 1) % n             # any partner: identity on slot 1
            emit(qa, qb, _lift_pair(pending[qa], None, B, dtype))
    return [(a, b, s16) for a, b, _, s16 in emitted]


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
        x = jnp.einsum("bij,bjR->biR", s16, x16, precision=_PREC)
        x = x.reshape((B,) + (2,) * (2 * n))
    pos = {axid: p for p, axid in enumerate(order)}
    x = jnp.transpose(x, [0] + [1 + pos[i] for i in range(2 * n)])
    return x.reshape(B, dim, dim)


def run_density_static(ct_struct: CircuitTensor, params: jnp.ndarray,
                       key_ids: np.ndarray, noise_table: np.ndarray,
                       dtype=COMPLEX_DTYPE,
                       variant: Optional[str] = None,
                       fuse: bool = True,
                       pair4: Optional[bool] = None) -> jnp.ndarray:
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

    ``fuse=True`` (default) runs the exact superop-fusion plan
    (:func:`fuse_superops`: NOP skip, 1q absorption, disjoint-commutation
    merge) — same channel sequence, ~3.6× fewer full-dm passes on the
    Ising bench template. ``fuse=False`` applies one superop per op slot.

    ``pair4`` additionally pairs disjoint fused superops into 4-qubit
    256×256 ops (:func:`pair_disjoint_superops`) — half the full-dm
    passes at 16× the (cheap) matmul FLOPs. Default: on for the TPU
    "transpose" variant when fusing, off elsewhere.
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

    if fuse:
        ops = fuse_superops(pairs, ct_struct.gate_ids, keys, table, mats,
                            B, n, dtype)
    else:
        def slot_s16(l):
            u = mats[:, l]                               # [B, 4, 4]
            s_gate = jnp.einsum("bpa,bqc->bpqac", u,
                                jnp.conj(u), precision=_PREC).reshape(B, 16, 16)
            s_noise = jnp.asarray(table[keys[l]])        # [16, 16] const
            return jnp.einsum("ij,bjk->bik", s_noise, s_gate, precision=_PREC)

        ops = [(a, b, slot_s16(l)) for l, (a, b) in enumerate(pairs)]

    if variant == "transpose_carry":
        perm = _perm_16(True)
        s16s = [s16 if a >= b else s16[:, perm, :][:, :, perm]
                for a, b, s16 in ops]
        return _run_carry([(a, b) for a, b, _ in ops], s16s, B, n, dtype)

    if pair4 is None:
        pair4 = fuse and variant == "transpose" and n >= 4
    dm = jnp.zeros((B, dim, dim), dtype).at[:, 0, 0].set(1.0)
    if pair4:
        for entry in pair_disjoint_superops(ops):
            if entry[0] == "s16":
                _, a, b, s16 = entry
                dm = apply_superop_static(dm, s16, a, b, n,
                                          variant=variant)
            else:
                _, qs, s256 = entry
                dm = apply_superop_multi(dm, s256, qs, n)
        return dm
    for a, b, s16 in ops:
        dm = apply_superop_static(dm, s16, a, b, n, variant=variant)
    return dm
