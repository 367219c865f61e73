"""Transfer-learning + stability workflows.

* :func:`finetune` — ``h08_finetuning``: train on device A, load the
  checkpoint, continue Adam on a (small) device-B dataset; compare
  zero-shot vs finetuned RMSE on B (the FakeLima → FakeMontreal study).
* :func:`calibration_drift` — ``05_stability_over_time`` /
  ``fetch_device_params``: device calibration snapshots over time (the
  shipped Lima/Montreal fixtures carry the real 2023 time series) and the
  resulting feature-vector drift.
* :func:`scalability_sweep` — ``06_scalability``: stabilizer-method data
  generation across n_qubits ∈ {5, 20, 50, 100, 200, 400}.
"""
from __future__ import annotations

import json
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..device.model import DeviceModel, GateProps, QubitProps
from ..device.registry import get_device
from ..metrics import rmse
from .datasets import LabeledDataset
from .mitigate import encode_dataset


def finetune(model, variables, train_ds_b: LabeledDataset,
             device_b: DeviceModel, test_ds_b: LabeledDataset,
             num_epochs: int = 30, learning_rate: float = 3e-4,
             seed: int = 0) -> Dict:
    """Continue training a checkpointed flax model on device-B data.

    Returns zero-shot and finetuned RMSEs on the B test set (h08's
    comparison).
    """
    from ..models.train import mlp_inputs, predict, train_model

    Xb, yb = encode_dataset(train_ds_b, device_b)
    Xt, yt = encode_dataset(test_ds_b, device_b)

    zero_shot = predict(model, variables, mlp_inputs, {"X": Xt})
    if zero_shot.ndim == 1:
        zero_shot = zero_shot[:, None]
    rmse_zero = float(rmse(zero_shot, yt))

    # continued Adam from the loaded variables (load_state_dict parity)
    import jax
    import jax.numpy as jnp
    import optax

    from ..utils.rng import prng_key

    params = variables["params"]
    has_bn = "batch_stats" in variables
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    key = prng_key(seed)
    y2 = yb if yb.ndim == 2 else yb[:, None]

    @jax.jit
    def step(params, batch_stats, opt_state, xb, yb, dk):
        def loss_fn(p):
            vars_in = {"params": p}
            if has_bn:
                vars_in["batch_stats"] = batch_stats
            out = model.apply(vars_in, xb, train=True,
                              rngs={"dropout": dk},
                              mutable=["batch_stats"] if has_bn else [])
            preds, mut = out if has_bn else (out[0], {})
            return jnp.mean((preds - yb) ** 2), mut.get("batch_stats",
                                                        batch_stats)

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    rng = np.random.default_rng(seed)
    n = Xb.shape[0]
    for _ in range(num_epochs):
        order = rng.permutation(n)
        for s in range(0, n, 32):
            sel = order[s:s + 32]
            key, dk = jax.random.split(key)
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, Xb[sel], y2[sel], dk)

    new_vars = {"params": params}
    if has_bn:
        new_vars["batch_stats"] = batch_stats
    tuned = predict(model, new_vars, mlp_inputs, {"X": Xt})
    if tuned.ndim == 1:
        tuned = tuned[:, None]
    return {
        "rmse_zero_shot": rmse_zero,
        "rmse_finetuned": float(rmse(tuned, yt)),
        "rmse_noisy": float(rmse(test_ds_b.noisy, test_ds_b.ideal)),
        "variables": new_vars,
    }


def calibration_snapshots(name: str = "ibmq_lima") -> Dict:
    """The shipped real calibration time series (device_params parity)."""
    import os

    from ..device import registry

    path = os.path.join(os.path.dirname(registry.__file__), "fixtures",
                        f"{name}_timeseries.json")
    with open(path) as f:
        return json.load(f)


def device_at_time(base: DeviceModel, series: Dict, t_index: int
                   ) -> DeviceModel:
    """Device model with calibration values from time snapshot ``t_index``."""
    dev = DeviceModel.from_dict(base.to_dict())
    for q in range(dev.num_qubits):
        dev.qubits[q] = QubitProps(
            t1=series["t1"][str(q)][t_index],
            t2=series["t2"][str(q)][t_index],
            readout_error=series["readout_err"][str(q)][t_index])
    for pair, errs in series["cnot_err"].items():
        a, b = pair.split("_")
        key = f"cx_{a}_{b}"
        if key in dev.gates:
            dev.gates[key] = GateProps(errs[t_index],
                                       dev.gates[key].gate_length)
    for q in range(dev.num_qubits):
        for g, errs in (("sx", series["sx_err"]), ("x", series["x_err"])):
            key = f"{g}_{q}"
            if key in dev.gates:
                dev.gates[key] = GateProps(errs[str(q)][t_index],
                                           dev.gates[key].gate_length)
    return dev


def calibration_drift(name: str = "ibmq_lima",
                      base_device: str = "fake_lima") -> Dict:
    """Stability-over-time study: feature drift across real snapshots."""
    from ..data.encoders import device_stat_vector

    series = calibration_snapshots(name)
    base = get_device(base_device)
    n_times = len(series["times"])
    vecs = []
    for t in range(n_times):
        dev_t = device_at_time(base, series, t)
        vecs.append(device_stat_vector(dev_t.properties()))
    vecs = np.stack(vecs)
    return {
        "times": series["times"],
        "stat_vectors": vecs,
        "drift_std": vecs.std(axis=0).tolist(),
        "drift_rel": (vecs.std(axis=0) / np.abs(vecs.mean(axis=0) + 1e-12)
                      ).tolist(),
    }


def scalability_sweep(qubit_counts: Sequence[int] = (5, 20, 50, 100,
                                                    200, 400),
                      depths: Sequence[int] = (1, 4, 7),
                      circuits_each: int = 20,
                      block_qubits: int = 5,
                      seed: int = 0) -> List[Dict]:
    """Stabilizer-method data-gen sweep (``06_scalability`` shape):
    composed Clifford circuits at growing widths, single-Z labels, timing.

    Default widths match the reference's sweep cell
    (``06_scalability.ipynb``: n_qubits in {5, 20, 50, 100, 200, 400}).
    """
    from ..circuits.families import generate_composed_clifford
    from ..circuits.observables import single_z
    from ..ops.stabilizer import batch_expectations

    rng = np.random.default_rng(seed)
    results = []
    for nq in qubit_counts:
        blocks = max(1, nq // block_qubits)
        for depth in depths:
            t0 = time.time()
            circs = [generate_composed_clifford(
                block_qubits, blocks, depth,
                seed=int(rng.integers(2 ** 31)))
                for _ in range(circuits_each)]
            vals = batch_expectations(circs, single_z(0, blocks *
                                                      block_qubits))
            dt = time.time() - t0
            results.append({
                "n_qubits": blocks * block_qubits,
                "depth": depth,
                "circuits": circuits_each,
                "seconds": dt,
                "circuits_per_sec": circuits_each / dt,
                "mean_abs_label": float(np.mean(np.abs(vals))),
            })
    return results
