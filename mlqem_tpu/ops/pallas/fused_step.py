"""Radix-matmul WHT + fused kicked-Ising Trotter step (Pallas).

The butterfly WHT is bandwidth-bound (n passes over the state). Two
reformulations used here:

* :func:`wht_radix` — WHT_dim = (WHT_A ⊗ I_128)·(I_A ⊗ WHT_128) with
  A = dim/128: two dense Hadamard matmuls (A×A over the block axis and
  128×128 over the lane axis). Both land on the MXU; XLA fuses to ~2
  passes instead of n.
* :func:`fused_trotter_step` — single-step fusion (interpret-validated;
  its 3D dot_general does not compile through this image's Mosaic remote
  compiler — the production multi-step kernel is ops/pallas/evolve.py).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _hadamard(k: int) -> np.ndarray:
    """Dense 2^k Hadamard matrix (entries ±2^{-k/2})."""
    h = np.array([[1.0]])
    for _ in range(k):
        h = np.block([[h, h], [h, -h]])
    return (h / np.sqrt(2.0 ** k)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _hadamard_pair(nq: int, lane_pow: int = 7):
    lane_pow = min(lane_pow, nq)
    k_hi = nq - lane_pow
    return (_hadamard(k_hi), _hadamard(lane_pow))


def wht_radix(state: jnp.ndarray, nq: int) -> jnp.ndarray:
    """WHT over [..., 2^nq] via two dense Hadamard matmuls.

    NOTE on bit ordering: with the state viewed as [A, 128] (row-major),
    lanes hold the LOW 7 bits and the block axis the HIGH bits, so
    (H_A ⊗ I)·(I ⊗ H_128) is exactly H⊗nq in the same bit convention as
    the butterfly implementation.
    """
    h_hi_np, h_lo_np = _hadamard_pair(nq)
    h_hi = jnp.asarray(h_hi_np)
    h_lo = jnp.asarray(h_lo_np)
    batch = state.shape[:-1]
    A = h_hi.shape[0]
    L = h_lo.shape[0]
    v = state.reshape(batch + (A, L))
    v = jnp.einsum("...al,lk->...ak", v, h_lo)
    v = jnp.einsum("ba,...al->...bl", h_hi, v)
    return v.reshape(batch + (A * L,))


# ---------------------------------------------------------------------------
# fused Trotter step kernel
# ---------------------------------------------------------------------------
def _step_kernel(re_ref, im_ref, kick_ref, bond_ref, tj_ref,
                 bitpm_ref, bondpar_ref, hhi_ref, hlo_ref,
                 re_out, im_out, *, theta_h: float, A: int, L: int):
    rows = re_ref.shape[0]
    dim = A * L

    def wht(re, im):
        def tx(x):
            v = x.reshape(rows * A, L) @ hlo_ref[:]
            v = v.reshape(rows, A, L)
            v = jax.lax.dot_general(
                hhi_ref[:], v.reshape(rows, A, L),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [A, rows, L]
            return v.transpose(1, 0, 2).reshape(rows, dim)
        return tx(re), tx(im)

    def phase_mult(re, im, expo):
        c = jnp.cos(expo)
        s = jnp.sin(expo)
        return re * c - im * s, re * s + im * c

    re = re_ref[:]
    im = im_ref[:]
    # RX layer: WHT · diag(exp(i·θh/2·Σ_q s_q·pm_q)) · WHT
    re, im = wht(re, im)
    expo1 = (theta_h / 2.0) * jnp.dot(kick_ref[:], bitpm_ref[:].T,
                                      preferred_element_type=jnp.float32)
    re, im = phase_mult(re, im, expo1)
    re, im = wht(re, im)
    # ZZ layers: diag(exp(-i·θJ/2·Σ_k par_k·s_k))
    expo2 = (-0.5) * tj_ref[:] * jnp.dot(
        bond_ref[:], bondpar_ref[:].T, preferred_element_type=jnp.float32)
    re, im = phase_mult(re, im, expo2)
    re_out[:] = re
    im_out[:] = im


@functools.partial(jax.jit, static_argnames=("theta_h", "A", "L",
                                             "block_rows", "interpret"))
def fused_trotter_step(re, im, kick_signs, bond_signs, theta_j_col,
                       bit_pm, bond_par, theta_h: float, A: int, L: int,
                       block_rows: int = 256, interpret: bool = False):
    """One kicked-Ising Trotter step, state resident in VMEM.

    re/im: [rows, dim]; kick_signs [rows, nq]; bond_signs [rows, nb];
    theta_j_col [rows, 1]; bit_pm [dim, nq]; bond_par [dim, nb].
    """
    rows, dim = re.shape
    block_rows = min(block_rows, rows)
    grid = (pl.cdiv(rows, block_rows),)
    h_hi, h_lo = _hadamard_pair(int(np.log2(dim)))

    def row_spec(width):
        return pl.BlockSpec((block_rows, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    fn = pl.pallas_call(
        functools.partial(_step_kernel, theta_h=theta_h, A=A, L=L),
        out_shape=(jax.ShapeDtypeStruct(re.shape, jnp.float32),
                   jax.ShapeDtypeStruct(im.shape, jnp.float32)),
        grid=grid,
        in_specs=[row_spec(dim), row_spec(dim),
                  row_spec(kick_signs.shape[1]),
                  row_spec(bond_signs.shape[1]),
                  row_spec(1),
                  const_spec(bit_pm.shape),
                  const_spec(bond_par.shape),
                  const_spec(h_hi.shape),
                  const_spec(h_lo.shape)],
        out_specs=(row_spec(dim), row_spec(dim)),
        interpret=interpret,
    )
    return fn(re, im, kick_signs, bond_signs, theta_j_col,
              bit_pm, bond_par, jnp.asarray(h_hi), jnp.asarray(h_lo))
