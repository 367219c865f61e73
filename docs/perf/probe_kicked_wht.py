"""TPU probe: kicked-Ising fused-kernel phase breakdown + WHT MXU modes.

Answers two questions on the real chip, at the headline bench config
(nq=10, steps=4, n_traj=32, batch=16384, 10k shots):

1. Where does the 0.5 s/batch go? (frame-sign sampling scan vs the fused
   evolution kernel vs readout/shots tail vs the ideal arm)
2. Is Mosaic's f32 dot multi-pass on the MXU — i.e. does the exact
   bf16 hi/lo WHT split (ops/pallas/evolve.py wht_mode="bf16_hilo") buy
   real throughput at f32-level accuracy? Plain "bf16" is the speed
   ceiling; block_rows 256/512 probes grid amortization.

Timing uses a forced host transfer (axon block_until_ready returns
early). Prints a JSON summary line at the end; diagnostics to stderr.

Run: timeout 3600 python docs/perf/probe_kicked_wht.py
"""
from __future__ import annotations

import json
import os as _os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run from a source checkout


def _tpu_up() -> bool:
    # compute probe, not just device listing — the tunnel has a half-up
    # mode where jax.devices() works but the first execute RPC hangs
    from mlqem_tpu.utils.platform import tpu_compute_up

    return tpu_compute_up(timeout_s=240)


def main():
    if not _tpu_up():
        print("TPU tunnel down — probe aborted (rerun later)",
              file=sys.stderr)
        print(json.dumps({"probe": "kicked_wht", "status": "tunnel_down"}))
        return

    import jax
    import jax.numpy as jnp

    from mlqem_tpu.device.registry import configurable_device
    from mlqem_tpu.ops.kicked_ising import KickedIsingEngine
    from mlqem_tpu.utils.rng import prng_key

    nq, steps, n_traj, batch, shots = 10, 4, 32, 16384, 10000
    dev = configurable_device(nq, seed=0)
    rng = np.random.default_rng(0)
    J = rng.uniform(0.05, 0.6, size=batch).astype(np.float32)
    summary = {"probe": "kicked_wht", "status": "ok", "batch": batch,
               "n_traj": n_traj}

    def timed(fn, reps=3):
        fn()  # compile + warm
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        # force a host transfer of a tiny device-side slice: axon sync is
        # deceptive, and a full-array transfer would dominate the timing
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])
        return (time.time() - t0) / reps

    # --- phase A: frame-sign sampling scan alone ----------------------
    eng = KickedIsingEngine(dev, nq=nq, steps=steps, dt=0.25,
                            n_traj=n_traj, shots=shots)
    key = prng_key(1)
    fs = jax.jit(lambda k: eng._frame_signs(k, batch))
    t_frames = timed(lambda: jax.block_until_ready(fs(key)))
    print(f"frame_signs scan: {t_frames:.3f}s", file=sys.stderr)
    summary["frame_signs_s"] = round(t_frames, 4)

    kick_s, bond_s, _ = jax.block_until_ready(fs(key))
    theta_j = (-2.0 * 0.25) * J
    tj_bt = jnp.repeat(jnp.asarray(theta_j), n_traj)
    theta_h = 2.0 * 1.0 * 0.25

    # --- phase B: fused evolution kernel, per wht_mode / block_rows ---
    # Probe the raw kernel on a 131072-row subset: the full 524288-row
    # batch plus per-mode output buffers exhausts the 16GB HBM when the
    # phase-A arrays are still live, and the mode comparison is relative
    # (per-row time is flat above ~64k rows — the grid fully amortizes).
    from mlqem_tpu.ops.pallas.evolve import evolve_fused

    S, nb = steps, len(eng.even_bonds) + len(eng.odd_bonds)
    BTp = 131072
    kick_flat = jnp.swapaxes(kick_s, 0, 1).reshape(-1, S * nq)[:BTp]
    bond_flat = jnp.swapaxes(bond_s, 0, 1).reshape(-1, S * nb)[:BTp]
    del kick_s, bond_s
    re0 = jnp.zeros((BTp, 2 ** nq), jnp.float32).at[:, 0].set(1.0)
    im0 = jnp.zeros((BTp, 2 ** nq), jnp.float32)
    tj_col = tj_bt[:BTp, None].astype(jnp.float32)
    bitpm_t = jnp.asarray(eng._bit_pm.T)
    bondpar_t = jnp.asarray(eng._bond_par.T)
    summary["kernel_probe_rows"] = BTp

    base = None
    for mode in ("f32", "bf16_hilo", "bf16"):
        for block_rows in (256, 512):
            def ev(mode=mode, block_rows=block_rows):
                re, im = evolve_fused(
                    re0, im0, kick_flat, bond_flat, tj_col, bitpm_t,
                    bondpar_t, float(theta_h), S, nq, nb,
                    block_rows=block_rows, wht_mode=mode)
                return jax.block_until_ready(re * re + im * im)

            try:
                t = timed(ev)
            except Exception as exc:  # remote-compile 500s etc.
                print(f"evolve[{mode},br={block_rows}] FAILED: "
                      f"{type(exc).__name__}: {exc}", file=sys.stderr)
                summary[f"evolve_{mode}_br{block_rows}_s"] = None
                continue
            print(f"evolve[{mode},br={block_rows}]: {t:.3f}s",
                  file=sys.stderr)
            summary[f"evolve_{mode}_br{block_rows}_s"] = round(t, 4)
            out = np.asarray(ev()[:1024])   # small slice: tunnel transfer
            if mode == "f32" and block_rows == 256:
                base = out
            elif base is not None:
                summary[f"maxdiff_{mode}_br{block_rows}"] = float(
                    np.abs(out - base).max())
    # free every phase-A/B device buffer before the end-to-end runs — the
    # generate() path allocates its own full-batch state
    del re0, im0, kick_flat, bond_flat, tj_col, key
    import gc
    gc.collect()

    # --- phase C: full generate() end-to-end per mode ------------------
    # Same seed across modes, so Δnoisy isolates WHT rounding: the noisy
    # arm is Monte-Carlo (32 trajectories, 10k shots — per-label sampling
    # σ ≈ 1/√shots + trajectory spread ≫ 1e-3), matching the standing
    # policy that MC-arm einsums run at DEFAULT precision.
    noisy_by_mode = {}
    for mode in ("f32", "bf16_hilo", "bf16"):
        e3 = KickedIsingEngine(dev, nq=nq, steps=steps, dt=0.25,
                               n_traj=n_traj, shots=shots, wht_mode=mode)
        def full():
            return e3.generate(J, seed=2)
        t = timed(full)
        ppm = batch / t * 60.0
        noisy_by_mode[mode] = np.asarray(full()[1])
        dn = ""
        if mode != "f32" and "f32" in noisy_by_mode:
            d = float(np.abs(noisy_by_mode[mode]
                             - noisy_by_mode["f32"]).max())
            summary[f"max_dnoisy_{mode}"] = d
            dn = f"  max|Δnoisy|={d:.2e}"
        print(f"generate[{mode}]: {t:.3f}s → {ppm:,.0f} pairs/min{dn}",
              file=sys.stderr)
        summary[f"generate_{mode}_s"] = round(t, 4)
        summary[f"pairs_per_min_{mode}"] = round(ppm)

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
