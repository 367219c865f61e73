"""Shot sampling: probability vectors → counts / sampled expectation values.

Replaces the counts side of the reference data pipelines
(``execute → get_counts`` in ``h13``-style notebooks; ``cal_z_exp`` /
``cal_all_z_exp`` consume counts, ``mbd_utils.py:328-411``). Sampling is a
batched categorical draw on device; counts dicts are only materialized at the
Python boundary for reference-format parity.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .unitaries import popcount


@partial(jax.jit, static_argnames=("shots",))
def sample_outcomes(key: jax.Array, probs: jnp.ndarray, shots: int
                    ) -> jnp.ndarray:
    """Draw basis-state outcomes: probs[..., D] → int32[..., shots].

    Inverse-CDF sampling (cumsum + vmapped binary search) — O(B·D + B·S·logD)
    instead of the gumbel trick's O(B·S·D) intermediate, which dominates
    compile and runtime at 10k-shot batches.
    """
    batch = probs.shape[:-1]
    D = probs.shape[-1]
    cdf = jnp.cumsum(probs.astype(jnp.float32), axis=-1)
    cdf = cdf / cdf[..., -1:]
    u = jax.random.uniform(key, batch + (shots,), dtype=jnp.float32)
    flat_cdf = cdf.reshape(-1, D)
    flat_u = u.reshape(-1, shots)
    idx = jax.vmap(lambda c, x: jnp.searchsorted(c, x))(flat_cdf, flat_u)
    return jnp.minimum(idx, D - 1).astype(jnp.int32).reshape(
        batch + (shots,))


@partial(jax.jit, static_argnames=("shots", "dim"))
def sample_histogram(key: jax.Array, probs: jnp.ndarray, shots: int,
                     dim: int) -> jnp.ndarray:
    """Sampled histogram (counts vector): probs[..., D] → int32[..., D]."""
    outcomes = sample_outcomes(key, probs, shots)
    one_hot = jax.nn.one_hot(outcomes, dim, dtype=jnp.int32)
    return jnp.sum(one_hot, axis=-2)


def sample_small_categorical(key: jax.Array, probs: jnp.ndarray,
                             shape) -> jnp.ndarray:
    """Categorical draws over a SMALL support without the gumbel blowup.

    ``jax.random.categorical`` materializes a [shape..., K] gumbel tensor —
    ~5GB for the trajectory engines' per-op Pauli choices at production
    batches. Here: one uniform per draw + K-1 fused elementwise
    comparisons against the CDF (index = #{cdf_k < u}), no K-sized
    intermediate. ``probs[..., K]`` must broadcast against ``shape`` on
    its leading axes (i.e. probs.shape[:-1] vs shape align from the right).
    """
    p = jnp.asarray(probs, jnp.float32)
    cdf = jnp.cumsum(p, axis=-1)
    cdf = cdf / cdf[..., -1:]
    u = jax.random.uniform(key, shape, dtype=jnp.float32)
    idx = jnp.zeros(shape, jnp.int32)
    for k in range(p.shape[-1] - 1):
        idx = idx + (u > cdf[..., k]).astype(jnp.int32)
    return idx


def sampled_z_expectations(key: jax.Array, probs: jnp.ndarray, shots: int,
                           num_qubits: int) -> jnp.ndarray:
    """Per-qubit ⟨Z_q⟩ estimated from `shots` samples: [..., nq]."""
    outcomes = sample_outcomes(key, probs, shots)
    outs = []
    for q in range(num_qubits):
        bit = (outcomes >> q) & 1
        outs.append(1.0 - 2.0 * jnp.mean(bit.astype(jnp.float32), axis=-1))
    return jnp.stack(outs, axis=-1)


def sampled_parity_expectation(key: jax.Array, probs: jnp.ndarray,
                               shots: int, z_mask: int) -> jnp.ndarray:
    """Sampled ⟨Π Z⟩ over the z_mask support."""
    outcomes = sample_outcomes(key, probs, shots)
    par = popcount(outcomes & jnp.int32(z_mask)) & 1
    return 1.0 - 2.0 * jnp.mean(par.astype(jnp.float32), axis=-1)


def expectation_from_probs(probs: jnp.ndarray, z_mask: int) -> jnp.ndarray:
    """Exact ⟨Π Z⟩ over z_mask from a probability vector."""
    dim = probs.shape[-1]
    j = jnp.arange(dim, dtype=jnp.int32)
    sign = 1 - 2 * (popcount(j & jnp.int32(z_mask)) & 1)
    return jnp.sum(probs * sign, axis=-1)


def histogram_to_counts(hist: np.ndarray, num_qubits: int) -> Dict[str, int]:
    """Counts-dict view (qiskit bitstring format: leftmost = highest qubit)."""
    out = {}
    for j, c in enumerate(np.asarray(hist)):
        if c > 0:
            out[format(j, f"0{num_qubits}b")] = int(c)
    return out


def counts_to_probs(counts: Dict[str, int], num_qubits: int) -> np.ndarray:
    """Counts dict → probability vector (reference
    ``counts_to_feature_vector`` parity, ``data/utils.py:178-195``)."""
    dim = 2 ** num_qubits
    vec = np.zeros(dim, dtype=np.float64)
    shots = sum(counts.values())
    for bits, c in counts.items():
        vec[int(bits, 2)] = c / shots
    return vec
