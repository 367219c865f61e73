"""Reproducible demo2 artifact generator (5-seed study).

ONE command regenerates ``docs/demos/results/demo2_4q_simulated.json``:
the reference's 4Q TFIM mitigation demo
(``/root/reference/docs/demos/demo2_ising_4q_hardware_plot.ipynb``) on
simulated fake_lima data, as a 5-seed study with per-run RMSE tables and
the published hardware anchors (the notebook's stored RMSE cell output:
noisy 0.11713 → mitigated 0.07471).

Run:  python docs/demos/make_demo2_artifact.py      (~15-20 min CPU)
"""
import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run from a source checkout
if _os.environ.get("JAX_PLATFORMS"):   # honored even where jax is
    import jax as _jax                 # pre-imported at startup
    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

RESULTS = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "results")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    ap.add_argument("--num-train", type=int, default=120)
    ap.add_argument("--out", default=_os.path.join(
        RESULTS, "demo2_4q_simulated.json"))
    args = ap.parse_args()

    import numpy as np

    from mlqem_tpu.workflows.demos import demo2_ising_4q

    t0 = time.time()
    runs = []
    for seed in args.seeds:
        out = demo2_ising_4q(num_steps=10, num_train=args.num_train,
                             shots=10000, seed=seed)
        runs.append({"seed": seed, **out})
        print(f"seed {seed}: noisy {out['rmse_noisy']:.5f} -> mitigated "
              f"{out['rmse_mitigated']:.5f} "
              f"({out['rmse_noisy'] / out['rmse_mitigated']:.2f}x)",
              flush=True)

    noisy = [r["rmse_noisy"] for r in runs]
    mit = [r["rmse_mitigated"] for r in runs]
    table = {
        "rmse_noisy_mean": float(np.mean(noisy)),
        "rmse_mitigated_mean": float(np.mean(mit)),
        "improvement_mean": float(np.mean(noisy) / np.mean(mit)),
        "rmse_mitigated_range": [float(np.min(mit)), float(np.max(mit))],
        # the reference notebook's stored RMSE cell output (aggregate of
        # the 4 qubits on IBM hardware data)
        "published_hardware_anchor": {"noisy": 0.11713,
                                      "mitigated": 0.07471},
        "runs": runs,
        "config": (f"config_4q_paper, fake_lima calibration noise, "
                   f"{args.num_train} train circuits, RF(300), 10k shots "
                   f"with a shared shot record per circuit (counts "
                   f"semantics), {len(args.seeds)} seeds"),
        "protocol": {"seeds": args.seeds,
                     "wall_seconds": round(time.time() - t0, 1)},
    }
    with open(args.out, "w") as f:
        json.dump(table, f, indent=1)
    print(f"wrote {args.out} ({time.time() - t0:.0f}s)")
    print(f"mean: noisy {table['rmse_noisy_mean']:.4f} -> mitigated "
          f"{table['rmse_mitigated_mean']:.4f} "
          f"({table['improvement_mean']:.2f}x; published anchor "
          f"0.11713 -> 0.07471, 1.57x)")


if __name__ == "__main__":
    main()
