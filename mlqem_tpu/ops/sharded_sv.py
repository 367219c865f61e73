"""Amplitude-sharded statevector simulation over a device mesh.

The reference caps exact simulation at what one Aer process holds; here the
2^n amplitude vector is sharded over the mesh's ``sp`` axis (SURVEY §5's
"context parallelism" analog), so ~30+ qubit statevectors span ICI. Design:

* The top k qubits (k = log2(#shards)) are *global*: their bit value selects
  the shard. The remaining n−k qubits are local.
* Gates on local qubits apply shard-locally (same bit-gather kernel as the
  single-chip engine).
* Gates touching global qubits exchange partner blocks with
  ``lax.ppermute`` (pure XLA collectives — no custom comm backend), then
  combine locally.

The circuit is unrolled host-side (qubit indices static per op) so each
op's communication pattern is fixed at trace time — no collectives under
data-dependent control flow. Compilation is cached per circuit *structure*
via the (gate_ids, qubits) hash; parameters stay traced, so parameter
sweeps of one family reuse the compiled program.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..circuits.circuit import Circuit, CircuitTensor, tensorize
from ..circuits.gates import GATE_NUM_QUBITS, GATE_NAMES, is_structural
from ..circuits.observables import PauliSum
from .statevector import apply_op
from .unitaries import COMPLEX_DTYPE, op_unitaries, pair_indices, popcount


def _apply_1q_local(state, mat2, q, n_local):
    """2x2 gate on a local qubit of state[2^n_local] (uniform 4x4 path)."""
    b = (q + 1) % n_local if n_local > 1 else 1
    mat4 = jnp.kron(mat2, jnp.eye(2, dtype=mat2.dtype))
    return apply_op(state, mat4, jnp.int32(q), jnp.int32(b),
                    max(n_local, 2))


def _apply_2q_local(state, mat4, a, b, n_local):
    return apply_op(state, mat4, jnp.int32(a), jnp.int32(b),
                    max(n_local, 2))


def _pp(axis, state, partner_xor, n_shards):
    """ppermute exchange with the shard whose id differs by partner_xor."""
    perm = [(i, i ^ partner_xor) for i in range(n_shards)]
    return jax.lax.ppermute(state, axis, perm)


def _shard_bit(axis, bit_pos):
    me = jax.lax.axis_index(axis)
    return (me >> bit_pos) & 1


def build_sharded_apply(circuit: Circuit, n_shards: int,
                        axis: str = "sp", dtype=COMPLEX_DTYPE):
    """Build fn(local_state, params[L,3]) applying the circuit SPMD.

    Use inside ``shard_map`` over the ``axis`` mesh axis. Gate structure
    (ids/qubits) is baked in; parameters are an argument so sweeps don't
    recompile.
    """
    n = circuit.num_qubits
    k = int(np.log2(n_shards))
    if 2 ** k != n_shards:
        raise ValueError("shard count must be a power of two")
    n_local = n - k
    if n_local < 1:
        raise ValueError("need at least 1 local qubit")
    ops = [op for op in circuit.ops if not is_structural(op.name)]
    ct = tensorize(circuit)

    def apply_fn(state, params):
        mats = op_unitaries(ct.gate_ids, params, dtype)  # [L, 4, 4]
        for l, op in enumerate(ops):
            mat4 = mats[l]
            nq = GATE_NUM_QUBITS.get(op.name, 1)
            if nq == 1:
                q = op.qubits[0]
                mat2 = mat4[::2, ::2] if False else mat4[(0, 2), :][:, (0, 2)]
                # U⊗I embedding: extract the 2x2 acting on the first slot
                mat2 = jnp.stack([mat4[0, (0, 2)], mat4[2, (0, 2)]])
                if q < n_local:
                    state = _apply_1q_local(state, mat2, q, n_local)
                else:
                    g = q - n_local
                    theirs = _pp(axis, state, 1 << g, n_shards)
                    b = _shard_bit(axis, g)
                    u_bb = mat2[b, b]
                    u_bo = mat2[b, 1 - b]
                    state = u_bb * state + u_bo * theirs
            else:
                a, b = op.qubits[0], op.qubits[1]
                a_loc, b_loc = a < n_local, b < n_local
                if a_loc and b_loc:
                    state = _apply_2q_local(state, mat4, a, b, n_local)
                elif not a_loc and not b_loc:
                    ga, gb = a - n_local, b - n_local
                    sa = _pp(axis, state, 1 << ga, n_shards)
                    sb = _pp(axis, state, 1 << gb, n_shards)
                    sab = _pp(axis, state, (1 << ga) | (1 << gb), n_shards)
                    va = _shard_bit(axis, ga)
                    vb = _shard_bit(axis, gb)
                    m_my = 2 * va + vb
                    # component blocks by local index m: mine, flip-b, flip-a,
                    # flip-both
                    blocks = [state, sb, sa, sab]
                    m_of = [m_my, 2 * va + (1 - vb), 2 * (1 - va) + vb,
                            2 * (1 - va) + (1 - vb)]
                    new = 0.0
                    for blk, m_in in zip(blocks, m_of):
                        coeff = mat4[m_my, m_in]
                        new = new + coeff * blk
                    state = new
                else:
                    # one global, one local: normalize to (global g, local q)
                    if a_loc:
                        # matrix indexed m = 2·v_a + v_b with a local —
                        # permute to make the global qubit the first slot
                        perm = jnp.asarray([0, 2, 1, 3])
                        mat4p = mat4[perm][:, perm]
                        g, q = b - n_local, a
                    else:
                        mat4p = mat4
                        g, q = a - n_local, b
                    theirs = _pp(axis, state, 1 << g, n_shards)
                    vg = _shard_bit(axis, g)
                    # local single-bit pair gather on q (ALL other local
                    # bits enumerated) for both blocks
                    from .unitaries import insert_bit

                    base = jnp.arange(2 ** (n_local - 1), dtype=jnp.int32)
                    t0 = insert_bit(base, jnp.int32(q))
                    idx0 = t0                       # local qubit q = 0
                    idx2 = t0 | (jnp.int32(1) << q)  # local qubit q = 1
                    comp = {}
                    for name, blk in (("mine", state), ("theirs", theirs)):
                        comp[(name, 0)] = blk[..., idx0]
                        comp[(name, 1)] = blk[..., idx2]
                    # m = 2·v_g + v_q ; v_g of "mine" = vg
                    new0 = 0.0
                    new1 = 0.0
                    for vq_in in (0, 1):
                        mine_in = comp[("mine", vq_in)]
                        their_in = comp[("theirs", vq_in)]
                        m_in_mine = 2 * vg + vq_in
                        m_in_their = 2 * (1 - vg) + vq_in
                        new0 = new0 + mat4p[2 * vg + 0, m_in_mine] * mine_in \
                            + mat4p[2 * vg + 0, m_in_their] * their_in
                        new1 = new1 + mat4p[2 * vg + 1, m_in_mine] * mine_in \
                            + mat4p[2 * vg + 1, m_in_their] * their_in
                    state = state.at[..., idx0].set(new0)
                    state = state.at[..., idx2].set(new1)
        return state

    return apply_fn


def sharded_statevector_fn(circuit: Circuit, mesh: Mesh, axis: str = "sp",
                           dtype=COMPLEX_DTYPE):
    """jit-ready fn(params[L,3]) → sharded |ψ⟩ of size 2^n over the mesh."""
    n_shards = mesh.shape[axis]
    n = circuit.num_qubits
    k = int(np.log2(n_shards))
    n_local = n - k
    apply_fn = build_sharded_apply(circuit, n_shards, axis, dtype)

    def make_state(params):
        def inner(params):
            me = jax.lax.axis_index(axis)
            local = jnp.zeros((2 ** n_local,), dtype)
            local = jnp.where(
                (me == 0) & (jnp.arange(2 ** n_local) == 0),
                jnp.ones((), dtype), local)
            return apply_fn(local, params)

        specs = P(axis)
        return jax.shard_map(inner, mesh=mesh,
                             in_specs=P(),
                             out_specs=specs)(params)

    return jax.jit(make_state)


def sharded_z_expectations(state_shards, circuit_n: int, mesh: Mesh,
                           axis: str = "sp") -> np.ndarray:
    """Per-qubit ⟨Z⟩ from an amplitude-sharded state (psum over shards)."""
    n_shards = mesh.shape[axis]
    k = int(np.log2(n_shards))
    n_local = circuit_n - k

    def inner(local):
        probs = jnp.real(local * jnp.conj(local))
        j = jnp.arange(probs.shape[-1], dtype=jnp.int32)
        outs = []
        me = jax.lax.axis_index(axis)
        for q in range(circuit_n):
            if q < n_local:
                sign = 1 - 2 * ((j >> q) & 1)
            else:
                sign = jnp.broadcast_to(
                    1 - 2 * ((me >> (q - n_local)) & 1), j.shape)
            outs.append(jnp.sum(probs * sign))
        vals = jnp.stack(outs)
        return jax.lax.psum(vals, axis)

    out = jax.shard_map(inner, mesh=mesh, in_specs=P(axis),
                        out_specs=P())(state_shards)
    return np.asarray(out)
