"""Pauli-frame trajectory engine vs the generic gather engine.

With identical presampled Pauli choices the two engines must produce
identical outcome distributions — the frame engine never applies a noise
Pauli to the state, so this is a strong end-to-end check of the frame
algebra (conjugation through CX, sign-flipped rotations, final XOR
permutation).
"""
import jax
import jax.numpy as jnp
import numpy as np

from mlqem_tpu.circuits.circuit import Circuit, CircuitTensor, stack_circuits
from mlqem_tpu.device.noise import NoiseModel
from mlqem_tpu.device.registry import configurable_device
from mlqem_tpu.ops.frame_trajectory import (frame_supported,
                                            run_frame_trajectories_probs)
from mlqem_tpu.ops.trajectory import (run_trajectories_presampled,
                                      twirled_noise_tables)
from mlqem_tpu.parallel.datagen import make_ising_template
from mlqem_tpu.utils.rng import prng_key


def _choices(pauli_probs, shape, seed=0):
    logits = jnp.log(jnp.clip(jnp.asarray(pauli_probs), 1e-30, 1.0))
    extra = (None,) * (len(shape) - logits.ndim + 1)
    return jax.random.categorical(prng_key(seed), logits[extra], axis=-1,
                                  shape=shape)


def test_ising_template_matches_generic_engine():
    nq, steps, B, T = 6, 3, 4, 8
    tpl = make_ising_template(nq, steps, "Z", 0.25, h=1.0)
    dev = configurable_device(nq, seed=0)
    nm = NoiseModel.from_device(dev)
    ct0 = tpl.bind_host(np.zeros(tpl.num_parameters, np.float32))
    assert frame_supported(ct0, nq)
    pp = twirled_noise_tables(ct0, nm)
    J = np.random.default_rng(1).uniform(0.05, 0.6, B).astype(np.float32)
    ct = tpl.bind(jnp.asarray(J[:, None]))
    choices = _choices(pp[None, None], (B, T, ct0.max_ops))
    sv = run_trajectories_presampled(ct0, ct.params, choices, nq)
    p_ref = np.asarray(jnp.real(sv * jnp.conj(sv)))
    p_new = np.asarray(run_frame_trajectories_probs(
        ct0, ct.params, choices, nq))
    np.testing.assert_allclose(p_ref, p_new, atol=1e-6)


def test_random_rotation_clifford_circuits_match():
    rng = np.random.default_rng(7)
    gates_1q = ["x", "y", "z", "h", "s", "sdg", "t", "tdg", "sx", "sxdg"]
    gates_2q = ["cx", "cy", "cz", "swap"]
    circs = []
    for _ in range(3):
        qc = Circuit(5)
        for _ in range(40):
            k = rng.integers(5)
            q = int(rng.integers(5))
            if k == 0:
                getattr(qc, gates_1q[int(rng.integers(len(gates_1q)))])(q)
            elif k == 1:
                getattr(qc, ["rx", "ry", "rz", "p"][int(rng.integers(4))])(
                    float(rng.uniform(-3, 3)), q)
            elif k == 2:
                a, b = rng.choice(5, 2, replace=False)
                qc.rzz(float(rng.uniform(-3, 3)), int(a), int(b))
            else:
                a, b = rng.choice(5, 2, replace=False)
                getattr(qc, gates_2q[int(rng.integers(len(gates_2q)))])(
                    int(a), int(b))
        circs.append(qc)
    ct = stack_circuits(circs)
    nm = NoiseModel.from_device(configurable_device(5, seed=0))
    pp = twirled_noise_tables(ct, nm)                 # [B, L, 16]
    T = 8
    choices = _choices(pp[:, None], (len(circs), T, ct.gate_ids.shape[1]),
                       seed=3)
    for i in range(len(circs)):
        cti = CircuitTensor(ct.gate_ids[i], ct.qubits[i], ct.params[i], 5)
        sv = run_trajectories_presampled(
            cti, jnp.asarray(ct.params[i][None]), choices[i][None], 5)
        p_ref = np.asarray(jnp.real(sv * jnp.conj(sv)))[0]
        p_new = np.asarray(run_frame_trajectories_probs(
            cti, jnp.asarray(ct.params[i][None]), choices[i][None],
            5))[0]
        np.testing.assert_allclose(p_ref, p_new, atol=1e-6)


def test_frame_supported_gates():
    qc = Circuit(3).h(0).cx(0, 1).crz(0.3, 1, 2)
    assert not frame_supported(stack_circuits([qc]))   # crz unsupported
    qc2 = Circuit(3).rx(0.3, 0).h(1).s(2).cz(0, 2).swap(1, 2).rzz(0.2, 0, 1)
    assert frame_supported(stack_circuits([qc2]))


def test_id_gate_noise_enters_the_frame():
    """'id' under a device model is pure idle noise — the sampled Pauli
    must hit the frame even though the gate itself is trivial."""
    qc = Circuit(3).rx(0.5, 0).id(2).cx(0, 1)
    ct = stack_circuits([qc])
    L = ct.gate_ids.shape[1]
    # force an X insertion (code 4 = X on the op's first qubit) at the id
    id_slot = [i for i, op in enumerate(
        [o for o in qc.ops]) if op.name == "id"][0]
    choices = np.zeros((1, 2, L), np.int32)
    choices[:, :, id_slot] = 4
    choices = jnp.asarray(choices)
    cti = CircuitTensor(ct.gate_ids[0], ct.qubits[0], ct.params[0], 3)
    sv = run_trajectories_presampled(cti, jnp.asarray(ct.params),
                                     choices, 3)
    p_ref = np.asarray(jnp.real(sv * jnp.conj(sv)))
    p_new = np.asarray(run_frame_trajectories_probs(
        cti, jnp.asarray(ct.params), choices, 3))
    np.testing.assert_allclose(p_ref, p_new, atol=1e-6)
    # and the X actually moved probability onto qubit 2's excited half
    assert p_new[0, 0, 4:].sum() > 0.99


def test_fused_marginals_match_probs_path():
    """The Pallas fused-marginal path (interpret mode on CPU) must equal
    confusion(probs)->z_expectations on a random full-gate-set circuit:
    frame-X correction and per-qubit readout both factorize over qubits."""
    from mlqem_tpu.ops.density import apply_readout_confusion
    from mlqem_tpu.ops.frame_trajectory import run_frame_trajectories_z
    from mlqem_tpu.ops.statevector import z_expectations

    rng = np.random.default_rng(11)
    nq = 4
    qc = Circuit(nq)
    g1 = ["rx", "ry", "rz", "p", "h", "s", "t", "sx", "x", "y", "z"]
    for _ in range(30):
        kind = rng.choice(["1q", "cx", "cy", "cz", "swap", "rzz"])
        if kind == "1q":
            g = str(rng.choice(g1))
            q = int(rng.integers(nq))
            if g in ("rx", "ry", "rz", "p"):
                getattr(qc, g)(float(rng.uniform(-2, 2)), q)
            else:
                getattr(qc, g)(q)
        else:
            a, b = rng.choice(nq, 2, replace=False)
            if kind == "rzz":
                qc.rzz(float(rng.uniform(-2, 2)), int(a), int(b))
            else:
                getattr(qc, kind)(int(a), int(b))
    ct = stack_circuits([qc])
    L = ct.gate_ids.reshape(-1).shape[0]
    B, T = 3, 8
    params = jnp.asarray(np.tile(np.asarray(ct.params, np.float32)[0][None],
                                 (B, 1, 1)))
    choices = jnp.asarray(rng.integers(0, 16, (B, T, L)).astype(np.int32))
    conf = np.stack([np.array([[1 - 0.02 * (q + 1), 0.01 * (q + 1)],
                               [0.02 * (q + 1), 1 - 0.01 * (q + 1)]],
                              np.float32) for q in range(nq)])
    probs = run_frame_trajectories_probs(ct, params, choices, nq)
    z_ref = np.asarray(z_expectations(
        apply_readout_confusion(probs, jnp.asarray(conf), nq,
                                variant="xor"), nq))
    z_new = np.asarray(run_frame_trajectories_z(
        ct, params, choices, nq, confusion=conf, interpret=True))
    np.testing.assert_allclose(z_new, z_ref, atol=2e-5)
    # no-confusion variant
    z_ref2 = np.asarray(z_expectations(probs, nq))
    z_new2 = np.asarray(run_frame_trajectories_z(
        ct, params, choices, nq, interpret=True))
    np.testing.assert_allclose(z_new2, z_ref2, atol=2e-5)
