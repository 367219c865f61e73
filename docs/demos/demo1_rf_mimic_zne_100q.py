"""Demo 1 — RF mimics ZNE at 100 qubits (fully simulated, smoke scale).

Reproduction of the reference's flagship demo
(``demo1_rf_mimic_zne_100q_twirl.ipynb``) at its FULL depth — Trotter
steps 1..10 — with the 100Q noisy + noise-amplified expectation values
produced by the exact light-cone engine instead of IBM hardware.

This script runs the CPU-affordable SMOKE statistics (5 error
realizations × 10000 shots): enough to see the per-step damping and the
pipeline end-to-end, but the per-point trajectory noise (~0.1) is far
above hardware's per-shot-realization σ≈0.005, so the mimic cannot reach
the published vs-ZNE numbers here.  The shipped artifact
(``make_demo1_artifact.py``, TPU) runs the hardware-faithful statistics
— the 50k measurement budget as 1024 realizations × 49 shots — where the
published comparison (noisy 0.0656 → mimic 0.0348, ~1.9×) applies.

Run: python docs/demos/demo1_rf_mimic_zne_100q.py   (~10-20 min on CPU)
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run from a source checkout
if _os.environ.get("JAX_PLATFORMS"):   # honored even where jax is
    import jax as _jax                 # pre-imported at startup
    _jax.config.update("jax_platforms",
                       _os.environ["JAX_PLATFORMS"])

import numpy as np

from mlqem_tpu.device.registry import configurable_device
from mlqem_tpu.workflows.demos import demo1_zne_mimic_100q


def main():
    from mlqem_tpu.workflows.demos import DEMO1_CALIBRATED_SCALE

    dev = configurable_device(100, seed=1)
    # the reference's full depth — exact light-cone engine, no truncation,
    # noise regime calibrated to the published noisy baseline
    out = demo1_zne_mimic_100q(device=dev, nq=100, num_steps=10,
                               noise_scale=DEMO1_CALIBRATED_SCALE, seed=0)
    print("qubits:", out["qubits"])
    print(f"RMSE noisy : {out['rmse_noisy']:.5f}")
    print(f"RMSE ZNE   : {out['rmse_zne']:.5f}")
    print(f"RMSE mimic : {out['rmse_mimic']:.5f} "
          f"({out['rmse_noisy'] / out['rmse_mimic']:.2f}x better than noisy)")
    print("per-qubit noisy :", np.round(out["rmse_per_qubit_noisy"], 4))
    print("per-qubit mimic :", np.round(out["rmse_per_qubit_mimic"], 4))
    print("max truncation discard:", round(out["max_truncation_discard"], 4))


if __name__ == "__main__":
    main()
