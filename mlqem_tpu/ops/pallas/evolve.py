"""Fully-fused kicked-Ising evolution kernel (Pallas).

The whole multi-step Trotter evolution runs with the state block resident
in VMEM: per step two dense Hadamard matmuls (MXU — the WHT as a dim×dim
±1/√dim matrix, trading cheap MXU flops for the butterfly path's n HBM
passes) and two diagonal phase multiplies whose exponents are computed
in-kernel from the per-step sign vectors (small MXU matmuls against ±1
bit/parity constant matrices). HBM traffic for the full evolution: one
state read + one write.

Mosaic-friendly by construction: 2D refs, jnp.dot with
preferred_element_type, elementwise VPU math — no reshapes or transposes.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


@functools.lru_cache(maxsize=8)
def _hadamard_full(nq: int) -> np.ndarray:
    h = np.array([[1.0]], dtype=np.float64)
    for _ in range(nq):
        h = np.block([[h, h], [h, -h]])
    return (h / np.sqrt(2.0 ** nq)).astype(np.float32)


def _evolve_kernel(re_ref, im_ref, kick_ref, bond_ref, tj_ref,
                   bitpm_ref, bondpar_ref, h_ref,
                   re_out, im_out, *, theta_h: float, steps: int,
                   nq: int, nb: int, wht_mode: str = "f32"):
    re = re_ref[:]
    im = im_ref[:]
    h = h_ref[:]
    bitpm_t = bitpm_ref[:]      # [nq, dim] (pre-transposed)
    bondpar_t = bondpar_ref[:]  # [nb, dim]
    tj = tj_ref[:]              # [rows, 1]

    if wht_mode == "f32":
        def _wht(x):
            return jnp.dot(x, h, preferred_element_type=jnp.float32)
    elif wht_mode == "bf16_hilo":
        # Exact-to-f32-rounding WHT at bf16 MXU rate: H's entries are
        # ±2^-nq/2-ish powers scaled — with h passed PRE-SCALED to ±1
        # (exact in bf16) and the 1/√dim folded in afterwards, split the
        # f32 amplitudes x = hi + lo (both bf16-representable) so each
        # product hi_i·(±1) is exact and only the f32 accumulation
        # rounds. Two bf16 passes replace Mosaic's multi-pass f32 dot.
        h_b = h.astype(jnp.bfloat16)
        scale = 1.0 / np.sqrt(2.0 ** nq)

        def _wht(x):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            y = (jnp.dot(hi, h_b, preferred_element_type=jnp.float32)
                 + jnp.dot(lo, h_b, preferred_element_type=jnp.float32))
            return y * scale
    elif wht_mode == "bf16":
        # speed ceiling probe: single lossy bf16 pass (~1e-3 drift/step)
        h_b = h.astype(jnp.bfloat16)
        scale = 1.0 / np.sqrt(2.0 ** nq)

        def _wht(x):
            return jnp.dot(x.astype(jnp.bfloat16), h_b,
                           preferred_element_type=jnp.float32) * scale
    else:  # pragma: no cover
        raise ValueError(f"unknown wht_mode {wht_mode!r}")

    for s in range(steps):
        kick_s = kick_ref[:, s * nq:(s + 1) * nq]       # [rows, nq]
        bond_s = bond_ref[:, s * nb:(s + 1) * nb]       # [rows, nb]
        # WHT
        re, im = _wht(re), _wht(im)
        # RX diagonal
        expo = (theta_h / 2.0) * jnp.dot(
            kick_s, bitpm_t, preferred_element_type=jnp.float32)
        c = jnp.cos(expo)
        sn = jnp.sin(expo)
        re, im = re * c - im * sn, re * sn + im * c
        # WHT
        re, im = _wht(re), _wht(im)
        # ZZ diagonal
        expo2 = (-0.5) * tj * jnp.dot(
            bond_s, bondpar_t, preferred_element_type=jnp.float32)
        c2 = jnp.cos(expo2)
        s2 = jnp.sin(expo2)
        re, im = re * c2 - im * s2, re * s2 + im * c2
    re_out[:] = re
    im_out[:] = im


@functools.partial(jax.jit, static_argnames=("theta_h", "steps", "nq",
                                             "nb", "block_rows",
                                             "interpret", "wht_mode"))
def evolve_fused(re, im, kick_signs, bond_signs, theta_j_col,
                 bit_pm_t, bond_par_t, theta_h: float, steps: int,
                 nq: int, nb: int, block_rows: int = 256,
                 interpret: bool = False, wht_mode: str = "f32"):
    """Full evolution: re/im [rows, 2^nq] → evolved planes.

    kick_signs [rows, steps·nq]; bond_signs [rows, steps·nb];
    theta_j_col [rows, 1]; bit_pm_t [nq, dim]; bond_par_t [nb, dim].
    wht_mode: "f32" (Mosaic multi-pass f32 dot), "bf16_hilo" (exact
    hi+lo split against the ±1 Hadamard — f32-rounding accuracy at two
    bf16 MXU passes), "bf16" (single lossy pass, speed-ceiling probe).
    """
    rows, dim = re.shape
    block_rows = min(block_rows, rows)
    grid = (pl.cdiv(rows, block_rows),)
    if wht_mode == "f32":
        h = jnp.asarray(_hadamard_full(nq))
    else:  # bf16 modes take the ±1 matrix (exact in bf16), scale in-kernel
        h = jnp.asarray(_hadamard_full(nq) * np.float32(np.sqrt(2.0 ** nq)))

    def row_spec(width):
        return pl.BlockSpec((block_rows, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    fn = pl.pallas_call(
        functools.partial(_evolve_kernel, theta_h=theta_h, steps=steps,
                          nq=nq, nb=nb, wht_mode=wht_mode),
        out_shape=(jax.ShapeDtypeStruct(re.shape, jnp.float32),
                   jax.ShapeDtypeStruct(im.shape, jnp.float32)),
        grid=grid,
        in_specs=[row_spec(dim), row_spec(dim),
                  row_spec(kick_signs.shape[1]),
                  row_spec(bond_signs.shape[1]),
                  row_spec(1),
                  const_spec(bit_pm_t), const_spec(bond_par_t),
                  const_spec(h)],
        out_specs=(row_spec(dim), row_spec(dim)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return fn(re, im, kick_signs, bond_signs, theta_j_col,
              bit_pm_t, bond_par_t, h)
