"""Platform detection shared by engine-variant dispatch sites."""
from __future__ import annotations

import jax


def on_tpu() -> bool:
    """True when the default jax backend is a TPU (incl. the axon tunnel)."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover - no backend at all
        return False


def tpu_compute_up(timeout_s: float = 240.0) -> bool:
    """Probe the TPU backend with a REAL bounded computation.

    The axon tunnel has a half-up failure mode where ``jax.devices()``
    succeeds but the first compile/execute RPC hangs forever (observed
    live: device listing in 2s, a 256×256 matmul never returning). Any
    caller about to commit to a long TPU run (bench.py, the perf probes,
    the parity generators) should gate on THIS — a subprocess that must
    compile, run, and transfer a tiny matmul within the timeout. Returns
    False on timeout or error; runs nothing when jax is already on CPU.
    """
    import os
    import subprocess
    import sys

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        return True
    code = ("import jax, jax.numpy as jnp, numpy as np; "
            "x = jnp.ones((256, 256)); "
            "print('ok', np.asarray(jnp.dot(x, x)[0, 0]))")
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s, text=True)
        return p.returncode == 0 and "ok" in p.stdout
    except subprocess.TimeoutExpired:
        return False
