"""Twirling certification: sampled twirls == analytic Pauli channel.

The pec_runtime replacement proof (reference h31 twirl cells): twirl
instances of a circuit under a COHERENT noise channel average to the
expectation under the analytic Pauli-twirled channel — the same
``pauli_channel_probs`` damping the kicked-Ising and Pauli-propagation
engines use.
"""
from itertools import product

import numpy as np

from mlqem_tpu.circuits.circuit import Circuit, Op
from mlqem_tpu.circuits.families import IsingModel, IsingOptions
from mlqem_tpu.circuits.observables import PauliSum, single_z
from mlqem_tpu.device.noise import NoiseModel, add_coherent_cx_noise
from mlqem_tpu.device.registry import get_device
from mlqem_tpu.mitigation.twirling import (_PAULI_NAMES,
                                           sample_twirled_circuits,
                                           twirl_average, twirl_table)
from mlqem_tpu.ops.channels import coherent_overrotation_cx, pauli_channel
from mlqem_tpu.ops.trajectory import pauli_channel_probs
from mlqem_tpu.primitives.estimator import NoisyEstimator


def _twirled_noise_model(nm: NoiseModel) -> NoiseModel:
    """Replace every local 2q channel with its analytic Pauli twirl."""
    out = NoiseModel(nm.num_qubits)
    for (gate, qubits), chan in nm.local_channels.items():
        probs = pauli_channel_probs(chan)
        pairs = [("IXYZ"[c // 4] + "IXYZ"[c % 4], float(p))
                 for c, p in enumerate(probs) if abs(p) > 1e-12]
        out.add_quantum_error(pauli_channel(pairs), gate, qubits)
    return out


def test_twirl_group_average_is_exact():
    """Averaging over ALL 16 Pauli twirl pairs of one noisy CX equals the
    analytic Pauli-twirled channel exactly (no sampling error)."""
    chan = coherent_overrotation_cx(0.3)
    nm = NoiseModel(2).add_quantum_error(chan, "cx", (0, 1))
    nm_tw = _twirled_noise_model(nm)
    tbl = twirl_table("cx")
    prep = [Op("ry", (0,), (0.7,)), Op("ry", (1,), (1.1,))]

    for obs_s in ["ZI", "IZ", "ZZ", "XX", "YI"]:
        obs = PauliSum(obs_s)
        circs = []
        for pa, pb in product(range(4), repeat=2):
            qa, qb = tbl[4 * pa + pb]
            qc = Circuit(2)
            qc.ops.extend(prep)
            if pa:
                qc.ops.append(Op(_PAULI_NAMES[pa], (0,), ()))
            if pb:
                qc.ops.append(Op(_PAULI_NAMES[pb], (1,), ()))
            qc.ops.append(Op("cx", (0, 1)))
            if qa:
                qc.ops.append(Op(_PAULI_NAMES[qa], (0,), ()))
            if qb:
                qc.ops.append(Op(_PAULI_NAMES[qb], (1,), ()))
            circs.append(qc)
        group_avg = float(np.mean(NoisyEstimator(nm, shots=None).run(
            circs, [obs] * 16).result().values))
        qc0 = Circuit(2)
        qc0.ops.extend(prep)
        qc0.ops.append(Op("cx", (0, 1)))
        analytic = float(NoisyEstimator(nm_tw, shots=None).run(
            [qc0], [obs]).result().values[0])
        assert abs(group_avg - analytic) < 1e-6, (obs_s, group_avg, analytic)


def test_sampled_twirl_converges_on_ising():
    """sample_twirled_circuits + twirl_average over the paper circuit
    family converges to the analytic twirled-channel value within sampling
    error (<= 3e-3 at >= 1k twirls, the h31 configuration scale)."""
    dev = get_device("fake_lima")
    nm = add_coherent_cx_noise(dev, theta=0.15, uniform=True,
                               add_depolarization=False,
                               base=NoiseModel(dev.num_qubits))
    nm.readout = None

    ops = IsingOptions(nq=4, h=1.0, J=0.4, dt=0.5, depth=2)
    qc = IsingModel.make_circuit(ops, measure=False)
    obs = [single_z(q, qc.num_qubits) for q in range(4)]

    est_tw = NoisyEstimator(_twirled_noise_model(nm), shots=None)
    analytic = np.array([est_tw.run([qc], [o]).result().values[0]
                         for o in obs])

    num_twirls = 1024
    twirled = sample_twirled_circuits(qc, num_twirls, seed=7)
    est = NoisyEstimator(nm, shots=None)
    sampled = np.stack([est.run(twirled, [o] * num_twirls).result().values
                        for o in obs])                     # [4, T]
    avg = twirl_average(sampled.reshape(-1), num_twirls).reshape(4)

    # the twirl does real work at theta=0.15 ...
    coherent = np.array([est.run([qc], [o]).result().values[0]
                         for o in obs])
    assert np.max(np.abs(coherent - analytic)) > 1e-3
    # ... and the sampled average reproduces the analytic channel.
    # (Balanced stratification makes per-gate marginals exactly uniform,
    # so the mean's error is far below the naive std/sqrt(T) bar — the
    # plain-MC ensemble misses 3e-3 by ~3x at this twirl count.)
    diff = np.abs(avg - analytic)
    assert np.max(diff) < 3e-3, diff


def test_balanced_twirl_unbiased_at_non_multiple_of_16():
    """num_twirls not divisible by 16 must still reach all 16 codes
    (a fixed arange slice would never put Y/Z on the control qubit)."""
    from mlqem_tpu.circuits.circuit import Circuit
    from mlqem_tpu.mitigation.twirling import sample_twirled_circuits

    qc = Circuit(2).h(0).cx(0, 1)
    control_paulis = set()
    for seed in range(24):
        for tw in sample_twirled_circuits(qc, num_twirls=8, seed=seed):
            # the op right before the cx (if any Pauli) is the control/
            # target pre-Pauli sandwich
            for i, op in enumerate(tw.ops):
                if op.name == "cx":
                    for prev in tw.ops[max(0, i - 2):i]:
                        if prev.name in ("x", "y", "z") \
                                and prev.qubits == (0,):
                            control_paulis.add(prev.name)
    assert control_paulis == {"x", "y", "z"}, control_paulis
