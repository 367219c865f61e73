"""VQE study + generalization workflows."""
import numpy as np
import pytest

from mlqem_tpu.apps.chemistry import load_h2_problems
from mlqem_tpu.device.registry import get_device
from mlqem_tpu.workflows.generalization import generalization_study
from mlqem_tpu.workflows.vqe_study import (train_vqe_processor, vqe_dataset,
                                           vqe_mitigation_study)

DEV = get_device("fake_lima")


def test_vqe_dataset_and_processor():
    data = vqe_dataset(DEV, samples_per_pauli=30, shots=None, seed=0)
    assert data["X"].shape[0] == len(data["circuits"])
    proc, stats = train_vqe_processor(DEV, data, n_estimators=50)
    assert stats["rmse_mitigated"] < stats["rmse_noisy"]


def test_vqe_mitigation_study_h2():
    data = vqe_dataset(DEV, samples_per_pauli=40, shots=None, seed=0)
    proc, _ = train_vqe_processor(DEV, data, n_estimators=60)
    _, fci, ham = load_h2_problems()[4]
    out = vqe_mitigation_study(DEV, ham, proc, maxiter=50, shots=None,
                               seed=0)
    assert abs(out["ideal"] - out["exact"]) < 5e-3
    assert out["error_mitigated"] < out["error_noisy"]


def test_generalization_study():
    out = generalization_study(DEV, per_config=8, shots=None, seed=0)
    interp = out["interpolation"]
    extrap = out["extrapolation"]
    # the study's finding: extrapolating outside the trained θ range
    # degrades the model sharply relative to interpolation inside it
    assert extrap["rmse_mitigated"] > interp["rmse_mitigated"]
    assert np.isfinite(interp["rmse_noisy"])
