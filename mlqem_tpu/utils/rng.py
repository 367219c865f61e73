"""PRNG key construction that avoids 64-bit host transfers.

``jax.random.PRNGKey`` transfers an ``np.int64`` scalar, which the axon TPU
platform rejects (UNIMPLEMENTED). The threefry2x32 raw key is just
``uint32[2] = [seed_hi, seed_lo]`` — build it directly from uint32 parts.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def prng_key(seed: int):
    """Drop-in replacement for ``jax.random.PRNGKey`` (raw uint32[2] key)."""
    seed = int(seed)
    return jnp.asarray(np.array([(seed >> 32) & 0xFFFFFFFF,
                                 seed & 0xFFFFFFFF], dtype=np.uint32))
