"""Per-step diagnostic for the faithful coherent GNN negative result.

VERDICT r4 #5: in the published coherent table the GNN improves 1.10x
(0.268 -> 0.243); in our faithful artifact it HURTS on 2/3 seeds (mean
0.296 vs noisy 0.268). Candidate causes: (a) depth extrapolation — the
faithful test sweep runs steps 0-29 but training only sees 0-14, and
coherent (interference-dominated) errors don't extrapolate the way
damping does; (b) the graph features missing the routed SWAP structure
(ruled out structurally: `graph_encode_dataset` encodes the routed,
lowered circuits); (c) the 1200-graph train subsample.

This probe splits the test RMSE of the noisy / RF / GNN arms into the
interpolation block (steps 0-14, inside the train distribution) and the
extrapolation block (steps 15-29) for one seed of both the coherent and
incoherent settings — same datasets and arm definitions as the artifact
(`workflows/paper_parity.py`). If the GNN's damage is concentrated in
the extrapolation block while its interpolation block beats noisy, (a)
is the cause and the negative result is a property of the protocol, not
a bug.

Run: timeout 7200 python docs/perf/probe_coherent_gnn.py [--settings ...]
Prints a JSON summary line at the end; diagnostics to stderr.
"""
from __future__ import annotations

import argparse
import json
import os as _os
import sys
import time

import numpy as np

sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])


def block_rmse(pred, y, lo, hi):
    return float(np.sqrt(np.mean((pred[lo:hi] - y[lo:hi]) ** 2)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings", nargs="+",
                    default=["coherent", "incoherent"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num-train", type=int, default=1500)
    ap.add_argument("--gnn-epochs", type=int, default=400)
    ap.add_argument("--shots", type=int, default=10000)
    args = ap.parse_args()

    from mlqem_tpu.circuits.families import IsingOptions
    from mlqem_tpu.device.registry import get_device
    from mlqem_tpu.models.forest import RandomForestRegressor
    from mlqem_tpu.workflows.datasets import ising_dataset, ising_step_sweep
    from mlqem_tpu.workflows.mitigate import encode_dataset
    from mlqem_tpu.workflows.paper_parity import _experiment_noise, _gnn_arm

    device = get_device("fake_lima")
    ops = IsingOptions.config_4q_paper()
    seed = args.seed
    summary = {"probe": "coherent_gnn", "seed": seed,
               "num_train": args.num_train, "settings": {}}

    for setting in args.settings:
        t0 = time.time()
        nm, scale = _experiment_noise(setting, device, None, 0,
                                      protocol="faithful")
        train = ising_dataset(device, options=ops,
                              num_circuits=args.num_train,
                              steps_range=(0, 15), J_range=(0.0, 1.0),
                              bases=("X", "Y", "Z"), noise=nm,
                              shots=args.shots, init_prefix=True,
                              lower=True, route=True,
                              ideal_shots=args.shots, seed=seed)
        test = ising_step_sweep(device, ops, 29, noise=nm,
                                shots=args.shots, init_prefix=True,
                                lower=True, route=True,
                                ideal_shots=args.shots, seed=seed + 1)
        Xtr, ytr = encode_dataset(train, device)
        Xte, yte = encode_dataset(test, device)
        print(f"[{setting}] datagen {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)

        preds = {"noisy": np.asarray(test.noisy)}
        rf_pred = np.zeros_like(yte)
        for q in range(yte.shape[1]):
            rf = RandomForestRegressor(n_estimators=300,
                                       random_state=seed + q)
            rf.fit(Xtr, ytr[:, q])
            rf_pred[:, q] = rf.predict(Xte)
        preds["random_forest"] = rf_pred
        print(f"[{setting}] rf {time.time() - t0:.0f}s", file=sys.stderr,
              flush=True)

        _, n_tr, gnn_pred = _gnn_arm(train, test, device, yte, True, 1200,
                                     args.gnn_epochs, seed,
                                     return_pred=True)
        preds["gnn"] = gnn_pred
        print(f"[{setting}] gnn {time.time() - t0:.0f}s (n_tr={n_tr})",
              file=sys.stderr, flush=True)

        rows = {}
        for name, p in preds.items():
            rows[name] = {
                "full": block_rmse(p, yte, 0, 30),
                "interp_0_14": block_rmse(p, yte, 0, 15),
                "extrap_15_29": block_rmse(p, yte, 15, 30),
            }
            print(f"[{setting}] {name:14s} full={rows[name]['full']:.4f} "
                  f"interp={rows[name]['interp_0_14']:.4f} "
                  f"extrap={rows[name]['extrap_15_29']:.4f}",
                  file=sys.stderr, flush=True)
        # per-step |error| averaged over qubits, for the writeup
        for name in ("noisy", "gnn"):
            per_step = np.sqrt(((preds[name] - yte) ** 2).mean(axis=1))
            rows[name]["per_step_rmse"] = [round(float(v), 4)
                                           for v in per_step]
        summary["settings"][setting] = {"noise_scale": scale, **rows}

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
