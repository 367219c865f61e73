"""Fused Walsh–Hadamard transform Pallas kernel.

STATUS: validated in interpret mode; the butterfly reshapes do NOT compile
through this image's Mosaic remote-compiler (lane-splitting reshapes).
The PRODUCTION fused kernel is ops/pallas/evolve.py, which reformulates the
WHT as dense Hadamard matmuls (2D refs + jnp.dot only) and fuses the whole
multi-step evolution. This file is kept as the butterfly formulation for
platforms whose Mosaic supports it.
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

_INV_SQRT2 = np.float32(1.0 / np.sqrt(2.0))


def _wht_kernel(re_ref, im_ref, re_out, im_out, *, nq: int):
    re = re_ref[:]
    im = im_ref[:]
    rows = re.shape[0]
    dim = re.shape[1]
    for q in range(nq):
        H = dim // (2 ** (q + 1))
        L = 2 ** q

        def butterfly(x):
            v = x.reshape(rows, H, 2, L)
            a = v[:, :, 0, :]
            b = v[:, :, 1, :]
            return jnp.stack([(a + b) * _INV_SQRT2,
                              (a - b) * _INV_SQRT2],
                             axis=2).reshape(rows, dim)

        re = butterfly(re)
        im = butterfly(im)
    re_out[:] = re
    im_out[:] = im


@functools.partial(jax.jit, static_argnames=("nq", "block_rows",
                                             "interpret"))
def wht_pallas_planes(re: jnp.ndarray, im: jnp.ndarray, nq: int,
                      block_rows: int = 256,
                      interpret: bool = False):
    """All-qubit WHT on [rows, 2^nq] real/imag planes (fused passes)."""
    rows, dim = re.shape
    assert dim == 2 ** nq
    block_rows = min(block_rows, rows)
    grid = (pl.cdiv(rows, block_rows),)
    spec = pl.BlockSpec((block_rows, dim), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(_wht_kernel, nq=nq),
        out_shape=(jax.ShapeDtypeStruct(re.shape, jnp.float32),
                   jax.ShapeDtypeStruct(im.shape, jnp.float32)),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
    )
    return fn(re, im)


def wht_fused(state: jnp.ndarray, nq: int, block_rows: int = 256,
              interpret: bool = False) -> jnp.ndarray:
    """Drop-in for :func:`mlqem_tpu.ops.kicked_ising.wht` on [..., 2^nq]
    complex64 states, using the fused Pallas kernel."""
    batch = state.shape[:-1]
    dim = state.shape[-1]
    rows = int(np.prod(batch)) if batch else 1
    re = jnp.real(state).reshape(rows, dim).astype(jnp.float32)
    im = jnp.imag(state).reshape(rows, dim).astype(jnp.float32)
    re, im = wht_pallas_planes(re, im, nq, block_rows, interpret)
    return (re + 1j * im).astype(state.dtype).reshape(batch + (dim,))


def pallas_available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return platform in ("tpu", "axon")
