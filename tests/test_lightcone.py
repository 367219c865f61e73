"""Light-cone engine: exactness, cone sufficiency, noise/readout parity.

The window restriction is EXACT (not an approximation) — these tests pin
that: the windowed statevector must agree with full-chain engines to
machine precision on the ideal arm, and with the exact twirled-channel
damping within sampling statistics on the noisy arms.
"""
import numpy as np
import pytest

from mlqem_tpu.device.registry import configurable_device
from mlqem_tpu.ops.lightcone import (LightconeIsing, cone_window,
                                     readout_affine)
from mlqem_tpu.ops.pauli_prop import PauliPropagatorIsing

NQ, DT, H = 10, 0.5, 0.5 * np.pi
J = np.array([0.05, 0.3, 0.55], np.float32)
QUBITS = [0, 4, 9]


@pytest.fixture(scope="module")
def device():
    return configurable_device(NQ, seed=1)


def test_cone_window_clamps():
    assert cone_window(0, 3, 10) == (0, 7)      # left edge
    assert cone_window(9, 3, 10) == (3, 7)      # right edge
    assert cone_window(5, 3, 10) == (2, 7)      # interior
    assert cone_window(5, 8, 10) == (0, 10)     # cone wider than chain


@pytest.mark.parametrize("h", [H, 0.66 * np.pi])
def test_ideal_exact_vs_pauli_prop(device, h):
    """Windowed statevector vs converged Heisenberg sum: two independent
    exact formulations must agree to float32 precision at every step —
    including windows strictly smaller than the chain (w=7 < nq=10).
    Covers both campaign kicks (Clifford h=0.5π and nonClifford 0.66π)."""
    steps = 3
    pp = PauliPropagatorIsing(device, nq=NQ, steps=steps, dt=DT, h=h,
                              max_terms=8192, noise=False)
    ref, _ = pp.generate_stepwise(J, qubits=QUBITS)
    lc = LightconeIsing(device, nq=NQ, steps=steps, dt=DT, h=h, n_traj=1,
                        shots=None, noise=False, readout=False)
    _, ideal = lc.generate_stepwise(J, qubits=QUBITS)
    assert np.abs(ideal - ref).max() < 1e-5


def test_noisy_trajectories_match_exact_channel(device):
    """Sampled twirl trajectories converge to the exact twirled-channel
    damping, at noise factors 1 and 3 (the ZNE pair)."""
    steps = 3
    pp = PauliPropagatorIsing(device, nq=NQ, steps=steps, dt=DT, h=H,
                              max_terms=8192, readout=False)
    lc = LightconeIsing(device, nq=NQ, steps=steps, dt=DT, h=H,
                        n_traj=3000, shots=None, readout=False)
    for nf in (1, 3):
        ref, _ = pp.generate_stepwise(J, noise_scale=nf, qubits=QUBITS)
        got, _ = lc.generate_stepwise(J, noise_scale=nf, qubits=QUBITS,
                                      seed=nf)
        assert np.abs(got - ref).max() < 0.04, nf


def test_noninteger_noise_factor_rejected(device):
    """Channel self-composition only amplifies by integers — a fractional
    ZNE factor must raise, not silently round to a different physics."""
    lc = LightconeIsing(device, nq=NQ, steps=2, n_traj=2, shots=None)
    with pytest.raises(ValueError, match="integer"):
        lc.generate_stepwise(J, noise_scale=1.5, qubits=(0,))


def test_readout_affine_closed_form(device):
    """With channels disabled and only readout confusion, the reported
    value must be exactly a·z + b per the confusion marginal."""
    from mlqem_tpu.device.noise import NoiseModel

    nm = NoiseModel(NQ)
    C = np.array([[0.97, 0.08], [0.03, 0.92]])   # asymmetric, col-stochastic
    for q in range(NQ):
        nm.set_readout_error(q, C)
    a, b = readout_affine(C)
    assert a == pytest.approx((0.97 - 0.03 + 0.92 - 0.08) / 2)
    assert b == pytest.approx((0.97 - 0.03 - 0.92 + 0.08) / 2)
    steps = 2
    lc_plain = LightconeIsing(device, nq=NQ, steps=steps, dt=DT, h=H,
                              n_traj=1, shots=None, noise=False,
                              readout=False)
    _, ideal = lc_plain.generate_stepwise(J, qubits=QUBITS)
    lc_ro = LightconeIsing(device, nq=NQ, steps=steps, dt=DT, h=H,
                           n_traj=1, shots=None, noise_model=nm,
                           readout=True)
    got, _ = lc_ro.generate_stepwise(J, qubits=QUBITS)
    assert np.abs(got - (a * ideal + b)).max() < 1e-5


def test_readout_correction_inverts_confusion(device):
    """readout_correct=True (the runtime's TREX semantics) must exactly
    undo the confusion affine at shots=None: corrected-confused values
    equal the readout-free engine's values bit-for-bit (same trajectory
    seed), including under CX channels at both ZNE noise factors."""
    from mlqem_tpu.device.noise import NoiseModel

    nm = NoiseModel.from_device(device)
    nm_clean = NoiseModel.from_device(device)
    nm_clean.readout = None
    steps = 2
    lc = LightconeIsing(device, nq=NQ, steps=steps, dt=DT, h=H,
                        n_traj=8, shots=None, noise_model=nm)
    lc_clean = LightconeIsing(device, nq=NQ, steps=steps, dt=DT, h=H,
                              n_traj=8, shots=None, noise_model=nm_clean)
    for nf in (1, 3):
        got, _ = lc.generate_stepwise(J, noise_scale=nf, qubits=QUBITS,
                                      seed=3, readout_correct=True)
        ref, _ = lc_clean.generate_stepwise(J, noise_scale=nf,
                                            qubits=QUBITS, seed=3)
        assert np.abs(got - ref).max() < 1e-6, nf


def test_shot_sampling_is_binomial(device):
    """shots=N draws real counts: the estimate deviates from the exact
    value but is unbiased and within ~5σ of binomial spread."""
    steps = 2
    lc_exact = LightconeIsing(device, nq=NQ, steps=steps, dt=DT, h=H,
                              n_traj=1, shots=None, noise=False,
                              readout=False)
    _, ideal = lc_exact.generate_stepwise(J, qubits=QUBITS)
    shots = 4096
    lc_shots = LightconeIsing(device, nq=NQ, steps=steps, dt=DT, h=H,
                              n_traj=4, shots=shots, noise=False,
                              readout=False)
    got, _ = lc_shots.generate_stepwise(J, qubits=QUBITS, seed=7)
    sigma = 1.0 / np.sqrt(4 * shots)   # worst case p=1/2, 4 trajectories
    diff = np.abs(got - ideal)
    assert diff.max() < 5 * sigma + 1e-6
    assert diff.max() > 0  # sampling actually happened


def test_demo1_lightcone_smoke(device):
    """demo1 at depth 4 on the light-cone engine end-to-end (small RF)."""
    from mlqem_tpu.workflows.demos import demo1_zne_mimic_100q

    out = demo1_zne_mimic_100q(device=device, nq=NQ, num_steps=4,
                               qubits=(0, 4, 9), n_estimators=20,
                               shots=10000, num_twirls=5, seed=0)
    assert out["engine"] == "lightcone"
    assert out["max_truncation_discard"] == 0.0
    assert len(out["rmse_per_step"]["noisy"]) == 4
    # zne < noisy is NOT asserted here: at 10q the device bias is smaller
    # than the 5-twirl sampling spread the extrapolation amplifies — the
    # inequality is checked on the real 100q artifact instead
    for k in ("rmse_noisy", "rmse_zne", "rmse_mimic"):
        assert 0.0 < out[k] < 1.0, (k, out[k])


def test_demo1_campaign_j00_clifford_row(device):
    """The campaign J draw pins circuit 0 to the Clifford J=0 reference
    (h29's generator: index 0 = J=0 at kick h=0.5π, NOT the campaign's
    nonClifford h=0.66π). Closed form: with J=0 the qubits are uncoupled
    and s kicks of rx(π/2·2·dt·2)… = rx(s·π/2 per step pair) give
    ⟨Z⟩ = cos(s·π/2) — 0 at odd steps, ±1 alternating at even steps."""
    from mlqem_tpu.workflows.demos import demo1_zne_mimic_100q

    out = demo1_zne_mimic_100q(device=device, nq=NQ, num_steps=4,
                               num_circ_per_step=5, train_per_step=2,
                               qubits=(1, 8), shots=None, num_twirls=2,
                               n_estimators=10, seed=0)
    j0 = sorted((r for r in out["rows"] if r["J"] == 0.0),
                key=lambda r: r["step"])
    assert len(j0) == 4
    for r in j0:
        want = np.cos(r["step"] * np.pi / 2.0)
        np.testing.assert_allclose(np.asarray(r["ideal"]), want, atol=1e-5)
    # every other row is the nonClifford campaign kick — at h=0.66π the
    # odd steps are NOT parity zeros (the r2 protocol bug this guards)
    others = [r for r in out["rows"] if r["J"] != 0.0 and r["step"] == 1]
    assert max(float(np.abs(np.asarray(r["ideal"])).max())
               for r in others) > 0.05


def test_demo1_campaign_j00_clifford_row_pauli_prop(device):
    """The J00 Clifford-reference convention holds on the pauli_prop
    engine too (it previously only applied to the lightcone default):
    row 0 evolves at the Clifford kick h=0.5π, ideal ⟨Z⟩ = cos(s·π/2)."""
    from mlqem_tpu.workflows.demos import demo1_zne_mimic_100q

    out = demo1_zne_mimic_100q(device=device, nq=NQ, num_steps=4,
                               num_circ_per_step=5, train_per_step=2,
                               qubits=(1, 8), shots=None, num_twirls=2,
                               n_estimators=10, seed=0,
                               engine="pauli_prop", max_terms=4096)
    j0 = sorted((r for r in out["rows"] if r["J"] == 0.0),
                key=lambda r: r["step"])
    assert len(j0) == 4
    for r in j0:
        want = np.cos(r["step"] * np.pi / 2.0)
        np.testing.assert_allclose(np.asarray(r["ideal"]), want, atol=1e-3)
    others = [r for r in out["rows"] if r["J"] != 0.0 and r["step"] == 1]
    assert max(float(np.abs(np.asarray(r["ideal"])).max())
               for r in others) > 0.05


def test_demo1_arrays_cache_roundtrip(tmp_path, device):
    """The engine-arm checkpoint reuses arms only on an exact protocol
    match (J draw/qubits/steps/scale/twirls/seed)."""
    from mlqem_tpu.workflows.demos import demo1_zne_mimic_100q

    cache = str(tmp_path / "arms.npz")
    kw = dict(device=device, nq=NQ, num_steps=2, qubits=(0, NQ - 1),
              num_circ_per_step=6, train_per_step=2, shots=1000,
              num_twirls=3, noise_scale=0.5, arrays_cache=cache, seed=0)
    o1 = demo1_zne_mimic_100q(**kw)
    o2 = demo1_zne_mimic_100q(**kw)            # hit
    for k in ("rmse_noisy", "rmse_zne", "rmse_mimic"):
        assert o1[k] == o2[k]
    o3 = demo1_zne_mimic_100q(**{**kw, "seed": 1})   # miss (new J draw)
    assert o3["rmse_noisy"] != o1["rmse_noisy"]


def test_t_chunk_exact_mean_and_statistics(device):
    """Realization chunking: equal t_chunk blocks with independent keys
    average exactly — the chunked estimator is deterministic, converges
    to the exact twirled channel like the unchunked one, and rejects
    non-dividing chunk sizes.  (This is the knob that makes hardware-
    faithful realization counts — n_traj ≈ 1024 at w=21 — fit HBM.)"""
    steps = 3
    pp = PauliPropagatorIsing(device, nq=NQ, steps=steps, dt=DT, h=H,
                              max_terms=8192, readout=False)
    ref, _ = pp.generate_stepwise(J, noise_scale=1, qubits=QUBITS)
    lc = LightconeIsing(device, nq=NQ, steps=steps, dt=DT, h=H,
                        n_traj=3072, t_chunk=1024, shots=None,
                        readout=False)
    got, _ = lc.generate_stepwise(J, noise_scale=1, qubits=QUBITS, seed=1)
    got2, _ = lc.generate_stepwise(J, noise_scale=1, qubits=QUBITS, seed=1)
    np.testing.assert_array_equal(got, got2)          # deterministic
    assert np.abs(got - ref).max() < 0.04
    with pytest.raises(ValueError):
        LightconeIsing(device, nq=NQ, steps=steps, n_traj=10, t_chunk=4)


def test_demo1_partial_chunk_resume(tmp_path, device):
    """Interrupted engine-arm runs resume from per-(arm, j-chunk)
    checkpoints: after deleting the aggregate cache, a rerun rebuilds
    the identical result from the parts with ZERO engine evolutions."""
    import mlqem_tpu.workflows.demos as demos
    from mlqem_tpu.ops.lightcone import LightconeIsing

    cache = str(tmp_path / "arms.npz")
    kw = dict(device=device, nq=NQ, num_steps=2, qubits=(0, NQ - 1),
              num_circ_per_step=6, train_per_step=2, shots=500,
              num_twirls=8, num_twirls_amp=4, t_chunk=4, j_chunk=2,
              noise_scale=0.5, arrays_cache=cache, seed=0)
    o1 = demos.demo1_zne_mimic_100q(**kw)
    import os
    os.remove(cache)
    calls = []
    orig = LightconeIsing.generate_stepwise

    def counting(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    LightconeIsing.generate_stepwise = counting
    try:
        o2 = demos.demo1_zne_mimic_100q(**kw)
    finally:
        LightconeIsing.generate_stepwise = orig
    assert not calls, f"{len(calls)} engine calls despite parts"
    for k in ("rmse_noisy", "rmse_zne", "rmse_mimic"):
        assert o1[k] == o2[k]
