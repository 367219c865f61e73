"""Demo reproductions (simulated end-to-end).

The reference's two advertised reproductions (``README.md:39-42``,
``docs/demos/``) rebuilt from scratch — including the data, which the
reference could only take from IBM hardware:

* :func:`demo1_zne_mimic_100q` — ``demo1_rf_mimic_zne_100q_twirl``: 100Q
  TFIM Trotter; noisy + noise-amplified expectation values from the sparse
  Pauli-propagation engine (truly 100 qubits, twirled device noise); linear
  ZNE extrapolation ``nf1 − (nf3 − nf1)/2`` (the demo's exact formula);
  per-qubit random forests trained to mimic ZNE from noisy values; RMSE
  table vs the ideal (noise-free propagation) reference.
* :func:`demo2_ising_4q` — ``demo2_ising_4q_hardware_plot``: 4Q TFIM
  step sweep, RF mitigation, per-qubit/aggregate RMSE + L2-per-step.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..circuits.families import IsingOptions
from ..device.model import DeviceModel
from ..device.registry import configurable_device, get_device
from ..metrics import l2_distance_per_step, rmse
from ..models.forest import RandomForestRegressor
from ..ops.pauli_prop import PauliPropagatorIsing


def demo1_zne_mimic_100q(device: Optional[DeviceModel] = None,
                         nq: int = 100,
                         num_steps: int = 10,
                         J_train: Sequence[float] = None,
                         J_test: Sequence[float] = None,
                         qubits: Sequence[int] = (0, 24, 49, 74, 99),
                         # demo1's verifiable config: Clifford kick
                         # (config_100q_paper_Clifford, h = 0.5π) — the
                         # RX(π/2) layer is Clifford so Pauli propagation
                         # splits only at the small-angle rz's and the
                         # ideal reference converges tightly
                         h: float = 0.5 * np.pi,
                         dt: float = 0.5,
                         max_terms: int = 8192,
                         noise_factors=(1.0, 3.0),
                         n_estimators: int = 100,
                         shot_noise: float = 0.006,
                         seed: int = 0) -> Dict:
    """100Q ZNE-mimicry, demo1 pipeline shape.

    Samples: (step, J) grid like the hardware campaign (10 Trotter steps ×
    J sweep); 5 single-Z observables; per-qubit RandomForest(100) mimics.
    ``shot_noise``: Gaussian measurement noise added to the simulated
    'hardware' values (10k-shot scale ≈ 0.01/√(nf·twirls)).
    """
    rng = np.random.default_rng(seed)
    device = device or configurable_device(nq, seed=1)
    J_train = list(J_train) if J_train is not None else \
        np.round(np.linspace(0.05, 0.55, 6), 3).tolist()
    J_test = list(J_test) if J_test is not None else \
        np.round(np.linspace(0.08, 0.52, 5), 3).tolist()
    qubits = [q for q in qubits if q < nq]

    def labels(J_values, steps, noise_scale):
        eng = PauliPropagatorIsing(device, nq=nq, steps=steps, dt=dt, h=h,
                                   max_terms=max_terms)
        vals, errs = eng.generate(np.asarray(J_values, np.float32),
                                  noise_scale=noise_scale, qubits=qubits)
        return vals, errs

    def ideal_labels(J_values, steps):
        eng = PauliPropagatorIsing(device, nq=nq, steps=steps, dt=dt, h=h,
                                   max_terms=max_terms, noise=False)
        return eng.generate(np.asarray(J_values, np.float32),
                            qubits=qubits)[0]

    rows = []
    all_J = J_train + J_test
    max_disc = 0.0
    for step in range(1, num_steps + 1):
        noisy, err1 = labels(all_J, step, noise_factors[0])
        amp, err3 = labels(all_J, step, noise_factors[1])
        ideal = ideal_labels(all_J, step)
        max_disc = max(max_disc, float(err1.max()), float(err3.max()))
        # simulated shot noise on the 'measured' values
        noisy = noisy + rng.normal(0, shot_noise, noisy.shape)
        amp = amp + rng.normal(0, shot_noise, amp.shape)
        # demo1's linear extrapolation: nf1 − (nf3 − nf1)/2
        zne = noisy - (amp - noisy) / 2.0
        for i, J in enumerate(all_J):
            rows.append({"step": step, "J": J, "split": "train"
                         if J in J_train else "test",
                         "noisy": noisy[i], "zne": zne[i],
                         "ideal": ideal[i]})

    tr = [r for r in rows if r["split"] == "train"]
    te = [r for r in rows if r["split"] == "test"]

    def stack(rows_, key):
        return np.stack([r[key] for r in rows_])

    # per-qubit RF mimics: features = (step, J, noisy values) — the demo's
    # few-feature per-qubit regression
    def feats(rows_):
        return np.column_stack([
            [r["step"] for r in rows_], [r["J"] for r in rows_],
            stack(rows_, "noisy")])

    Xtr, Xte = feats(tr), feats(te)
    mimic_te = np.zeros_like(stack(te, "zne"))
    for qi in range(len(qubits)):
        rf = RandomForestRegressor(n_estimators=n_estimators,
                                   random_state=seed + qi)
        rf.fit(Xtr, stack(tr, "zne")[:, qi])
        mimic_te[:, qi] = rf.predict(Xte)

    ideal_te = stack(te, "ideal")
    noisy_te = stack(te, "noisy")
    zne_te = stack(te, "zne")
    return {
        "rmse_noisy": float(rmse(noisy_te, ideal_te)),
        "rmse_zne": float(rmse(zne_te, ideal_te)),
        "rmse_mimic": float(rmse(mimic_te, ideal_te)),
        "rmse_per_qubit_noisy": rmse(noisy_te, ideal_te, axis=0).tolist(),
        "rmse_per_qubit_mimic": rmse(mimic_te, ideal_te, axis=0).tolist(),
        "max_truncation_discard": max_disc,
        "qubits": list(qubits),
        "rows": rows,
    }


def demo2_ising_4q(device: Optional[DeviceModel] = None,
                   num_steps: int = 10,
                   num_train: int = 120,
                   shots: Optional[int] = 10000,
                   seed: int = 0) -> Dict:
    """4Q TFIM Trotter mitigation, demo2 pipeline shape.

    Trains an RF on randomized (J, steps) circuits, evaluates on the
    paper-config step sweep; reports per-qubit/aggregate RMSE and the
    L2-vs-ideal per Trotter step curve.
    """
    from .datasets import ising_dataset, ising_step_sweep
    from .mitigate import encode_dataset

    device = device or get_device("fake_lima")
    ops = IsingOptions.config_4q_paper()
    train = ising_dataset(device, options=ops, num_circuits=num_train,
                          steps_range=(0, num_steps + 1), shots=shots,
                          seed=seed)
    test = ising_step_sweep(device, ops, num_steps, shots=shots,
                            seed=seed + 1)
    Xtr, ytr = encode_dataset(train, device)
    Xte, yte = encode_dataset(test, device)
    rf = RandomForestRegressor(n_estimators=300, random_state=seed)
    rf.fit(Xtr, ytr)
    pred = rf.predict(Xte)
    return {
        "rmse_noisy": float(rmse(test.noisy, test.ideal)),
        "rmse_mitigated": float(rmse(pred, test.ideal)),
        "rmse_per_qubit_noisy": rmse(test.noisy, test.ideal,
                                     axis=0).tolist(),
        "rmse_per_qubit_mitigated": rmse(pred, test.ideal, axis=0).tolist(),
        "l2_per_step_noisy": l2_distance_per_step(test.noisy,
                                                  test.ideal).tolist(),
        "l2_per_step_mitigated": l2_distance_per_step(pred,
                                                      test.ideal).tolist(),
        "steps": [m["steps"] for m in test.meta],
    }
