"""Reproducible paper-parity artifact generator.

ONE command regenerates ``docs/results/paper_parity_table.json`` and the
``paper_parity_*.png`` figures from scratch: all three published noise
settings × 3 seeds through the full single-Ising protocol
(``mlqem_tpu.workflows.paper_parity``), at the noise scales calibrated to
the published noisy baselines (reference bundles:
``/root/reference/docs/paper_figures/{incoherent,coherent,no_readout}_single_ising.pk``
rendered by ``plot.ipynb``).

Run:      python docs/results/make_paper_parity.py            (~TPU recommended)
Refit:    python docs/results/make_paper_parity.py --calibrate
Quick:    python docs/results/make_paper_parity.py --fast     (CI smoke scale)
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

RESULTS_DIR = _os.path.dirname(_os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calibrate", action="store_true",
                    help="refit the per-setting noise scales and print them")
    ap.add_argument("--protocol", default="faithful",
                    choices=["faithful", "v2"],
                    help="faithful = the reference's published-table "
                         "protocol (init prefix, lowered circuits, random "
                         "J/basis train at steps 0-14, fixed-J test sweep "
                         "0-29); v2 = the r2/r3 interpolation protocol")
    ap.add_argument("--fast", action="store_true",
                    help="reduced protocol (smoke scale, NOT the artifact)")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--settings", nargs="+",
                    default=["incoherent", "coherent", "no_readout"],
                    help="setting order — with a resume parts-dir, put the "
                         "diagnostic setting first so a wall-clock-bounded "
                         "run banks the most informative parts")
    ap.add_argument("--num-train", type=int, default=1500,
                    help="faithful-protocol train-set size (the reference's "
                         "own is 4500 = 300/step; 1500 reproduces the "
                         "published improvement factors at a third of the "
                         "datagen/RF cost and is recorded in run_info)")
    ap.add_argument("--gnn-epochs", type=int, default=400)
    ap.add_argument("--redo-arms", nargs="+", default=None,
                    choices=["random_forest", "ols", "mlp", "gnn", "zne"],
                    help="re-run just these arms inside every CACHED part "
                         "and rewrite it (surgical one-arm fix; seeded "
                         "datasets keep the other arms exact)")
    ap.add_argument("--parts-dir", default=_os.path.join(
        RESULTS_DIR, "parts"),
        help="per-(setting, seed) resume cache; '' disables")
    ap.add_argument("--out", default=_os.path.join(
        RESULTS_DIR, "paper_parity_table.json"))
    args = ap.parse_args()

    from mlqem_tpu.workflows.paper_parity import (calibrate_coherent_theta,
                                                  calibrate_noise_scale,
                                                  paper_parity_study)

    if args.calibrate:
        if args.protocol == "faithful":
            for s in ("incoherent", "no_readout"):
                out = calibrate_noise_scale(s, protocol="faithful")
                print(f"{s}: scale={out['scale']:.4f} "
                      f"rmse={out['rmse']:.4f} target={out['target']:.3f}")
            out = calibrate_coherent_theta()
            print(f"coherent: theta_mult={out['theta_mult']:.3f} "
                  f"rmse={out['rmse']:.4f} target={out['target']:.3f} "
                  f"(inc scale fixed at {out['inc_scale']})")
            print("paste into workflows/paper_parity.py::FAITHFUL_SCALE")
            return
        for s in ("incoherent", "coherent", "no_readout"):
            out = calibrate_noise_scale(s)
            print(f"{s}: scale={out['scale']:.4f} "
                  f"rmse={out['rmse']:.4f} target={out['target']:.3f}")
        print("paste into workflows/paper_parity.py::CALIBRATED_SCALE")
        return

    kwargs = {"protocol": args.protocol}
    if args.protocol == "faithful":
        kwargs.update(num_train=args.num_train, gnn_epochs=args.gnn_epochs)
    if args.fast:
        kwargs.update(num_train=60, max_steps=10, num_test_steps=10,
                      mlp_epochs=50, gnn_epochs=100, num_twirls=4)
    t0 = time.time()
    study = paper_parity_study(settings=tuple(args.settings),
                               seeds=tuple(args.seeds),
                               parts_dir=args.parts_dir or None,
                               redo_arms=args.redo_arms or None, **kwargs)
    study["run_info"] = {"fast": bool(args.fast),
                         "wall_seconds": round(time.time() - t0, 1),
                         **kwargs}
    with open(args.out, "w") as f:
        json.dump(study, f, indent=1)
    print(f"wrote {args.out} ({time.time() - t0:.0f}s)")

    from mlqem_tpu.workflows.figures import figure_paper_parity

    table = {s: {"ours": v["ours_mean"], "published": v["published"],
                 "ours_std": v["ours_std"]}
             for s, v in study["settings"].items()}
    png = _os.path.join(RESULTS_DIR, "paper_parity_figure.png")
    figure_paper_parity(table, save_path=png)
    print(f"wrote {png}")

    for s, v in study["settings"].items():
        print(f"\n[{s}] (noise_scale={v['noise_scale']}, "
              f"num_twirls={v['num_twirls']})")
        for m in sorted(v["ours_mean"]):
            pub = v["published"].get(m)
            pub_s = f" published={pub:.3f}" if pub is not None else ""
            print(f"  {m:15s} ours={v['ours_mean'][m]:.4f}"
                  f"±{v['ours_std'][m]:.4f}{pub_s}")


if __name__ == "__main__":
    main()
