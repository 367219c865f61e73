"""Platform detection shared by engine-variant dispatch sites."""
from __future__ import annotations

import jax


def on_tpu() -> bool:
    """True when the default jax backend is a TPU (incl. the axon tunnel)."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover - no backend at all
        return False
