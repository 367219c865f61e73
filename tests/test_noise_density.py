"""Noise channels + density-matrix engine correctness."""
import numpy as np
import pytest

from mlqem_tpu.circuits.circuit import Circuit, stack_circuits, tensorize
from mlqem_tpu.circuits.observables import PauliSum
from mlqem_tpu.device.model import DeviceModel
from mlqem_tpu.device.noise import (NoiseModel, add_coherent_cx_noise,
                                    compile_noise_table, readout_matrices)
from mlqem_tpu.device.registry import get_device
from mlqem_tpu.ops.channels import (Channel, coherent_overrotation_cx,
                                    depol_param_for_target_error,
                                    depolarizing_channel, identity_channel,
                                    pauli_channel, readout_confusion,
                                    thermal_relaxation_channel)
from mlqem_tpu.ops.density import (apply_readout_confusion,
                                   batch_density_matrices, dm_probabilities,
                                   expval_pauli_sum_dm, purity, run_density)
from mlqem_tpu.ops.statevector import statevector


def _noiseless_table(ct):
    return compile_noise_table(ct, None)


def test_channels_trace_preserving():
    chans = [
        depolarizing_channel(0.1, 1),
        depolarizing_channel(0.2, 2),
        thermal_relaxation_channel(1e-4, 1.2e-4, 1e-6),
        pauli_channel([("X", 0.1), ("I", 0.9)]),
        coherent_overrotation_cx(0.3),
        identity_channel(2),
    ]
    for ch in chans:
        assert ch.is_trace_preserving(), ch


def test_coherent_overrotation_identity_at_zero():
    ch = coherent_overrotation_cx(0.0)
    u = ch.kraus[0]
    phase = u[0, 0]
    np.testing.assert_allclose(u / phase, np.eye(4), atol=1e-12)


def test_density_matches_statevector_noiseless(rng):
    qc = Circuit(3)
    for _ in range(15):
        qc.ry(float(rng.uniform(-3, 3)), int(rng.integers(3)))
        qc.cx(int(rng.integers(3)), int((rng.integers(2) + 1 +
                                         rng.integers(1)) % 3 or 1))
    qc2 = Circuit(3).h(0).cx(0, 1).t(1).cx(1, 2).rz(0.7, 2)
    for circ in (qc2,):
        ct = tensorize(circ)
        keys, table = _noiseless_table(ct)
        dm = np.asarray(run_density(ct, keys, table))
        psi = np.asarray(statevector(ct))
        np.testing.assert_allclose(dm, np.outer(psi, np.conj(psi)), atol=1e-5)


def test_depolarizing_shrinks_bloch_vector():
    p = 0.3
    nm = NoiseModel(1).add_all_qubit_quantum_error(
        depolarizing_channel(p, 1), "x")
    qc = Circuit(1).x(0)
    ct = tensorize(qc)
    keys, table = compile_noise_table(ct, nm)
    dm = run_density(ct, keys, table)
    z = float(expval_pauli_sum_dm(dm, PauliSum("IZ")))  # qubit0 = rightmost char
    # 1q depolarizing(p): Bloch vector scales by (1-p) → ⟨Z⟩ = -(1-p)
    assert abs(z - (-(1 - p))) < 1e-6


def test_thermal_relaxation_t1_decay():
    t1, t2, time = 1e-4, 1.3e-4, 2.5e-5
    nm = NoiseModel(1).add_all_qubit_quantum_error(
        thermal_relaxation_channel(t1, t2, time), "x")
    qc = Circuit(1).x(0)
    ct = tensorize(qc)
    keys, table = compile_noise_table(ct, nm)
    dm = run_density(ct, keys, table)
    z = float(expval_pauli_sum_dm(dm, PauliSum("IZ")))
    # |1⟩ decays: P(1) = e^{-t/T1} → ⟨Z⟩ = 1 - 2e^{-t/T1}
    expected = 1 - 2 * np.exp(-time / t1)
    assert abs(z - expected) < 1e-6


def test_thermal_relaxation_t2_decay():
    t1, t2, time = 1e-4, 1.3e-4, 2.5e-5
    nm = NoiseModel(1).add_all_qubit_quantum_error(
        thermal_relaxation_channel(t1, t2, time), "h")
    qc = Circuit(1).h(0)
    ct = tensorize(qc)
    keys, table = compile_noise_table(ct, nm)
    dm = run_density(ct, keys, table)
    x = float(expval_pauli_sum_dm(dm, PauliSum("IX")))
    assert abs(x - np.exp(-time / t2)) < 1e-6


def test_depol_param_solver():
    # with no relaxation, p should reproduce the avg-error relation exactly
    for nq, err in [(1, 0.001), (2, 0.008)]:
        p = depol_param_for_target_error(err, None, nq)
        ch = depolarizing_channel(p, nq)
        assert abs((1 - ch.average_gate_fidelity()) - err) < 1e-9


def test_from_device_hits_calibrated_error():
    dev = get_device("fake_lima")
    nm = NoiseModel.from_device(dev)
    ch = nm.channel_for("cx", (0, 1))
    got_err = 1 - ch.average_gate_fidelity()
    want = dev.gate_error("cx", (0, 1))
    assert abs(got_err - want) < 1e-4


def test_readout_confusion_application():
    p = 0.1
    conf = np.stack([readout_confusion(p), np.eye(2)])
    qc = Circuit(2).x(0)
    ct = tensorize(qc)
    keys, table = _noiseless_table(ct)
    dm = run_density(ct, keys, table)
    probs = dm_probabilities(dm)
    probs = apply_readout_confusion(probs, conf, 2)
    probs = np.asarray(probs)
    # state |01⟩ (qubit0=1): readout flips qubit0 with prob p
    assert abs(probs[0b01] - (1 - p)) < 1e-6
    assert abs(probs[0b00] - p) < 1e-6


def test_coherent_cx_noise_model():
    dev = get_device("fake_lima")
    nm = add_coherent_cx_noise(dev, theta=0.1 * np.pi, uniform=True,
                               add_depolarization=True, add_coherent=True)
    qc = Circuit(2).h(0).cx(0, 1)
    ct = tensorize(qc)
    keys, table = compile_noise_table(ct, nm)
    dm = run_density(ct, keys, table)
    zz = float(expval_pauli_sum_dm(dm, PauliSum("ZZ")))
    # noiseless Bell: ⟨ZZ⟩ = 1; coherent overrotation + depol must reduce it
    assert 0.5 < zz < 1.0
    # and the purity drops below 1 (incoherent part present)
    assert float(purity(dm)) < 1.0


def test_batched_density(rng):
    dev = get_device("fake_lima")
    nm = NoiseModel.from_device(dev)
    circs = []
    for k in range(4):
        qc = Circuit(3)
        qc.rx(0.3 * (k + 1), 0).cx(0, 1).cx(1, 2)
        circs.append(qc)
    ct = stack_circuits(circs)
    keys, table = compile_noise_table(ct, nm)
    dms = np.asarray(batch_density_matrices(ct, keys, table))
    for i, qc in enumerate(circs):
        cti = tensorize(qc, ct.max_ops)
        ki, ti = compile_noise_table(cti, nm)
        single = np.asarray(run_density(cti, ki, ti))
        np.testing.assert_allclose(dms[i], single, atol=1e-6)


def test_device_registry_and_properties():
    for name in ["fake_lima", "fake_montreal", "fake_belem",
                 "fake_sherbrooke"]:
        dev = get_device(name)
        props = dev.properties()
        assert props["num_qubits"] == dev.num_qubits
        assert set(props.keys()) == {"name", "gates_set", "num_qubits",
                                     "qubits_props", "gate_props"}
        q0 = props["qubits_props"][0]
        assert q0["t1"] > 0 and q0["t2"] > 0
    lima = get_device("fake_lima")
    assert lima.num_qubits == 5
    # real calibration snapshot values survive the round trip
    assert abs(lima.t1(0) - 9.922062340725514e-05) < 1e-12
    sher = get_device("fake_sherbrooke")
    assert sher.num_qubits == 127
    assert "ecr" in sher.basis_gates


def test_channel_for_reversed_order_swaps_slots():
    """Asymmetric 2q channels fetched via the reversed-qubit fallback must
    have their local tensor slots exchanged (SWAP conjugation)."""
    from mlqem_tpu.device.noise import NoiseModel
    from mlqem_tpu.ops.channels import Channel, amplitude_damping_channel

    # damping only on the SECOND local slot of (0, 1)
    ad = amplitude_damping_channel(0.3)
    asym = Channel([np.kron(np.eye(2), k) for k in ad.kraus])
    nm = NoiseModel(2).add_quantum_error(asym, "cx", (0, 1))

    direct = nm.channel_for("cx", (0, 1))
    assert direct is asym

    rev = nm.channel_for("cx", (1, 0))
    # In the reversed orientation the damped qubit is the FIRST local slot.
    want = Channel([np.kron(k, np.eye(2)) for k in ad.kraus])
    np.testing.assert_allclose(rev.superop(), want.superop(), atol=1e-12)


def test_density_static_variants_match_end_to_end():
    """All three run_density_static variants (einsum / transpose /
    transpose_carry) produce the same noisy density matrices on a real
    template + calibration noise table."""
    import jax.numpy as jnp

    from mlqem_tpu.device.noise import NoiseModel, compile_noise_table
    from mlqem_tpu.device.registry import configurable_device
    from mlqem_tpu.ops.density_static import run_density_static
    from mlqem_tpu.parallel.datagen import make_ising_template

    nq = 3
    dev = configurable_device(nq, seed=0)
    nm = NoiseModel.from_device(dev)
    template = make_ising_template(nq, 2, "Z", 0.25, h=1.0)
    ct0 = template.bind_host(np.zeros(template.num_parameters, np.float32))
    keys, table = compile_noise_table(ct0, nm)
    rng = np.random.default_rng(1)
    params = jnp.asarray(rng.uniform(
        -1.0, 1.0, size=(4,) + ct0.params.shape).astype(np.float32))
    outs = {v: np.asarray(run_density_static(ct0, params, keys, table,
                                             variant=v))
            for v in ("einsum", "transpose", "transpose_carry")}
    np.testing.assert_allclose(outs["einsum"], outs["transpose"], atol=1e-6)
    np.testing.assert_allclose(outs["einsum"], outs["transpose_carry"],
                               atol=1e-6)
    # physical: unit trace, Hermitian
    tr = np.trace(outs["transpose_carry"], axis1=1, axis2=2)
    np.testing.assert_allclose(tr, 1.0, atol=1e-5)


def test_superop_fusion_matches_unfused():
    """The exact superop-fusion plan (NOP skip + 1q absorption +
    disjoint-commutation merge) reproduces the one-superop-per-slot path
    on a calibrated Ising template, for every variant, and emits the
    predicted op count (2q sandwiches merged, trailing 1q layer paired)."""
    import jax
    import jax.numpy as jnp

    from mlqem_tpu.circuits.gates import GATE_NUM_QUBITS, GATE_NAMES
    from mlqem_tpu.device.noise import NoiseModel, compile_noise_table
    from mlqem_tpu.device.registry import configurable_device
    from mlqem_tpu.ops.density_static import (fuse_superops,
                                              run_density_static,
                                              static_pairs)
    from mlqem_tpu.ops.unitaries import op_unitaries
    from mlqem_tpu.parallel.datagen import make_ising_template

    nq, steps = 4, 2
    dev = configurable_device(nq, seed=0)
    nm = NoiseModel.from_device(dev)
    template = make_ising_template(nq, steps, "Z", 0.25, h=1.0)
    ct0 = template.bind_host(np.zeros(template.num_parameters, np.float32))
    keys, table = compile_noise_table(ct0, nm)
    rng = np.random.default_rng(7)
    params = jnp.asarray(rng.uniform(
        -1.0, 1.0, size=(3,) + ct0.params.shape).astype(np.float32))

    base = np.asarray(run_density_static(ct0, params, keys, table,
                                         variant="einsum", fuse=False))
    for v in ("einsum", "transpose", "transpose_carry"):
        fused = np.asarray(run_density_static(ct0, params, keys, table,
                                              variant=v, fuse=True))
        np.testing.assert_allclose(fused, base, atol=2e-6, err_msg=v)

    # plan size: each lowered rzz (cx-rz-cx) merges to ONE superop, the
    # leading rx layer absorbs into the first bond layer, the trailing rx
    # layer pairs up -> bonds*steps + ceil(nq/2) emitted ops
    gate_ids = np.asarray(ct0.gate_ids).reshape(-1)
    mats = jax.vmap(lambda p: op_unitaries(
        jnp.asarray(ct0.gate_ids), p))(params)
    plan = fuse_superops(static_pairs(ct0), gate_ids,
                         np.asarray(keys).reshape(-1),
                         np.asarray(table, np.complex64), mats,
                         3, nq, jnp.complex64)
    # each lowered rzz costs ONE emitted superop; trailing-1q leftovers
    # pair up and may merge backward into same-set bond ops, so the plan
    # is at most bonds·steps + ceil(nq/2) (measured: exactly bonds·steps
    # here — the trailing rx layer merges into the final bond layer)
    n_slots = int((gate_ids != 0).sum())
    bonds = nq - 1
    assert len(plan) <= bonds * steps + (nq + 1) // 2, (len(plan), n_slots)
    assert len(plan) <= n_slots // 2, (len(plan), n_slots)


def test_superop_pair4_matches_unfused():
    """The 4q disjoint-pair plan (256×256 superops) reproduces the
    one-superop-per-slot path and halves the pass count on the layered
    Ising template."""
    import jax
    import jax.numpy as jnp

    from mlqem_tpu.device.noise import NoiseModel, compile_noise_table
    from mlqem_tpu.device.registry import configurable_device
    from mlqem_tpu.ops.density_static import (fuse_superops,
                                              pair_disjoint_superops,
                                              run_density_static,
                                              static_pairs)
    from mlqem_tpu.ops.unitaries import op_unitaries
    from mlqem_tpu.parallel.datagen import make_ising_template

    nq, steps = 6, 2
    dev = configurable_device(nq, seed=0)
    nm = NoiseModel.from_device(dev)
    template = make_ising_template(nq, steps, "Z", 0.25, h=1.0)
    ct0 = template.bind_host(np.zeros(template.num_parameters, np.float32))
    keys, table = compile_noise_table(ct0, nm)
    rng = np.random.default_rng(9)
    params = jnp.asarray(rng.uniform(
        -1.0, 1.0, size=(2,) + ct0.params.shape).astype(np.float32))
    base = np.asarray(run_density_static(ct0, params, keys, table,
                                         variant="einsum", fuse=False))
    paired = np.asarray(run_density_static(ct0, params, keys, table,
                                           variant="transpose", fuse=True,
                                           pair4=True))
    np.testing.assert_allclose(paired, base, atol=2e-6)

    mats = jax.vmap(lambda p: op_unitaries(
        jnp.asarray(ct0.gate_ids), p))(params)
    ops = fuse_superops(static_pairs(ct0), np.asarray(ct0.gate_ids),
                        np.asarray(keys).reshape(-1),
                        np.asarray(table, np.complex64), mats,
                        2, nq, jnp.complex64)
    plan = pair_disjoint_superops(ops)
    n256 = sum(1 for e in plan if e[0] == "s256")
    assert n256 >= len(ops) // 3          # most ops actually pair
    assert len(plan) <= (len(ops) + 1) // 2 + 2


def test_superop_fusion_reversed_orientation_and_padding():
    """Fusion merges same-set ops of OPPOSITE slot orientation (cx(0,1)
    then cx(1,0)) and skips NOP padding slots, matching the unfused path."""
    import jax.numpy as jnp

    from mlqem_tpu.circuits.circuit import Circuit, tensorize
    from mlqem_tpu.device.noise import NoiseModel, compile_noise_table
    from mlqem_tpu.device.registry import configurable_device
    from mlqem_tpu.ops.density_static import run_density_static

    nq = 3
    c = Circuit(nq)
    c.h(0)
    c.cx(0, 1)
    c.rz(0.3, 1)
    c.cx(1, 0)          # same set, reversed orientation
    c.rx(0.7, 2)
    c.cx(1, 2)
    ct = tensorize(c, max_ops=12)   # pad with NOP slots
    dev = configurable_device(nq, seed=0)
    keys, table = compile_noise_table(ct, NoiseModel.from_device(dev))
    params = jnp.asarray(np.broadcast_to(
        np.asarray(ct.params, np.float32), (2,) + ct.params.shape))
    base = np.asarray(run_density_static(ct, params, keys, table,
                                         variant="einsum", fuse=False))
    fused = np.asarray(run_density_static(ct, params, keys, table,
                                          variant="einsum", fuse=True))
    np.testing.assert_allclose(fused, base, atol=2e-6)
    tr = np.trace(fused, axis1=1, axis2=2)
    np.testing.assert_allclose(tr, 1.0, atol=1e-5)


def test_superop_fusion_absorbs_noisy_1q_channels():
    """A 1q gate carrying its own noise channel (S4 ⊗ I by construction)
    absorbs exactly; an artificial NON-factoring table entry on a 1q slot
    falls back to the emitted-op path instead of mis-absorbing."""
    import jax.numpy as jnp

    from mlqem_tpu.circuits.circuit import Circuit, tensorize
    from mlqem_tpu.device.noise import NoiseModel, compile_noise_table
    from mlqem_tpu.device.registry import configurable_device
    from mlqem_tpu.ops.channels import depolarizing_channel
    from mlqem_tpu.ops.density_static import run_density_static

    nq = 2
    c = Circuit(nq)
    c.sx(0)
    c.rz(0.4, 0)
    c.cx(0, 1)
    c.sx(1)
    ct = tensorize(c)
    dev = configurable_device(nq, seed=0)
    nm = NoiseModel.from_device(dev)
    nm.add_quantum_error(depolarizing_channel(0.02, 1), "sx", (0,))
    nm.add_quantum_error(depolarizing_channel(0.03, 1), "sx", (1,))
    keys, table = compile_noise_table(ct, nm)
    assert np.asarray(keys).reshape(-1).astype(bool).sum() >= 3
    params = jnp.asarray(np.asarray(ct.params, np.float32)[None])
    base = np.asarray(run_density_static(ct, params, keys, table,
                                         variant="einsum", fuse=False))
    fused = np.asarray(run_density_static(ct, params, keys, table,
                                          variant="einsum", fuse=True))
    np.testing.assert_allclose(fused, base, atol=2e-6)

    # corrupt a 1q slot's noise into a genuinely 2q channel: fusion must
    # detect the non-factoring superop and keep the op emitted
    table2 = np.array(table, np.complex64)
    k_sx0 = int(np.asarray(keys).reshape(-1)[0])
    table2[k_sx0] = np.asarray(
        depolarizing_channel(0.05, 2).superop(), np.complex64)
    base2 = np.asarray(run_density_static(ct, params, keys, table2,
                                          variant="einsum", fuse=False))
    fused2 = np.asarray(run_density_static(ct, params, keys, table2,
                                           variant="einsum", fuse=True))
    np.testing.assert_allclose(fused2, base2, atol=2e-6)
    assert not np.allclose(base2, base, atol=1e-4)  # the corruption bites


def test_superop_transpose_variant_matches_einsum():
    """The TPU lane-dense transpose form of the static superop application
    is bit-identical to the einsum form for every (a, b) ordering."""
    import jax.numpy as jnp

    from mlqem_tpu.ops.density_static import apply_superop_static

    rng = np.random.default_rng(0)
    n, dim = 5, 32
    for (a, b) in [(0, 1), (1, 0), (2, 4), (4, 2), (0, 4), (3, 2)]:
        dm = jnp.asarray((rng.normal(size=(2, dim, dim))
                          + 1j * rng.normal(size=(2, dim, dim))
                          ).astype(np.complex64))
        s16 = jnp.asarray((rng.normal(size=(2, 16, 16))
                           + 1j * rng.normal(size=(2, 16, 16))
                           ).astype(np.complex64))
        o1 = np.asarray(apply_superop_static(dm, s16, a, b, n, "einsum"))
        o2 = np.asarray(apply_superop_static(dm, s16, a, b, n, "transpose"))
        np.testing.assert_allclose(o1, o2, atol=1e-5)
