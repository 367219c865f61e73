"""Mesh sharding: datagen pipeline + amplitude-sharded statevector."""
import numpy as np
import pytest

import jax

from mlqem_tpu.circuits.circuit import Circuit, tensorize
from mlqem_tpu.circuits.families import IsingModel, IsingOptions, random_circuit
from mlqem_tpu.circuits.observables import PauliSum, single_z
from mlqem_tpu.device.registry import get_device
from mlqem_tpu.ops.sharded_sv import (sharded_statevector_fn,
                                      sharded_z_expectations)
from mlqem_tpu.ops.statevector import (probabilities, statevector,
                                       z_expectations)
from mlqem_tpu.parallel.datagen import IsingLabelPipeline
from mlqem_tpu.parallel.mesh import make_mesh, pad_to_multiple


def test_mesh_helpers():
    mesh = make_mesh()
    assert mesh.shape["dp"] * mesh.shape["sp"] == len(jax.devices())
    mesh2 = make_mesh(dp=4, sp=2)
    assert mesh2.shape == {"dp": 4, "sp": 2}
    arrays, n = pad_to_multiple({"a": np.zeros((5, 3))}, 8)
    assert arrays["a"].shape == (8, 3) and n == 5


def test_datagen_pipeline_sharded_matches_unsharded():
    dev = get_device("fake_lima")
    J = np.linspace(0.1, 0.5, 16)
    p1 = IsingLabelPipeline(dev, nq=4, steps=2, shots=None, dt=0.5)
    ideal1, noisy1 = p1.generate(J, seed=0)
    mesh = make_mesh()
    p2 = IsingLabelPipeline(dev, nq=4, steps=2, shots=None, dt=0.5)
    ideal2, noisy2 = p2.generate(J, seed=0, mesh=mesh)
    np.testing.assert_allclose(ideal1, ideal2, atol=1e-5)
    np.testing.assert_allclose(noisy1, noisy2, atol=1e-5)
    # noise damps towards zero on average
    assert np.mean(np.abs(noisy1)) < np.mean(np.abs(ideal1)) + 1e-9


def test_compile_cache_keyed_on_mesh():
    """Warming up WITHOUT a mesh must not pin later sharded calls to the
    unsharded program (and vice versa) — regression for a mesh-blind cache.
    Checked for both engines that cache compiled programs."""
    from mlqem_tpu.ops.kicked_ising import KickedIsingEngine

    dev = get_device("fake_lima")
    J = np.linspace(0.1, 0.5, 16)
    mesh = make_mesh()

    # pipeline: unsharded first, then sharded (the bug's trigger order)
    pipe = IsingLabelPipeline(dev, nq=4, steps=2, shots=None, dt=0.5)
    i0, n0 = pipe.generate(J, seed=0)
    i1, n1 = pipe.generate(J, seed=0, mesh=mesh)
    np.testing.assert_allclose(i0, i1, atol=1e-5)
    np.testing.assert_allclose(n0, n1, atol=1e-5)
    assert set(pipe._compiled) == {None, mesh}

    # kicked engine: sharded first, then unsharded
    eng = KickedIsingEngine(dev, nq=4, steps=2, dt=0.5, n_traj=16,
                            shots=None, use_pallas=False)
    i2, n2 = eng.generate(J, seed=0, mesh=mesh)
    i3, n3 = eng.generate(J, seed=0)
    np.testing.assert_allclose(i2, i3, atol=1e-5)
    np.testing.assert_allclose(n2, n3, atol=1e-5)
    assert set(eng._compiled) == {None, mesh}


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_sharded_statevector_matches_single(sp):
    mesh = make_mesh(dp=len(jax.devices()) // sp, sp=sp)
    n = 6
    qc = random_circuit(n, 5, seed=42)
    fn = sharded_statevector_fn(qc, mesh)
    ct = tensorize(qc)
    psi_sharded = np.asarray(fn(ct.params))
    psi_ref = np.asarray(statevector(ct))[: 2 ** n]
    # global phases identical (same op order) → direct comparison
    np.testing.assert_allclose(psi_sharded, psi_ref, atol=1e-5)


def test_sharded_z_expectations():
    sp = 4
    mesh = make_mesh(dp=len(jax.devices()) // sp, sp=sp)
    n = 5
    ops = IsingOptions.config_4q_paper()
    import dataclasses
    ops = dataclasses.replace(ops, nq=n)
    qc = IsingModel.make_circs_sweep(ops, 2, "Z", measure=False)
    fn = sharded_statevector_fn(qc, mesh)
    ct = tensorize(qc)
    psi = fn(ct.params)
    z_sh = sharded_z_expectations(psi, n, mesh)
    z_ref = np.asarray(z_expectations(
        probabilities(statevector(ct)), n))
    np.testing.assert_allclose(z_sh, z_ref, atol=1e-5)


def test_sharded_param_sweep_no_recompile():
    sp = 2
    mesh = make_mesh(dp=len(jax.devices()) // sp, sp=sp)
    qc = Circuit(4).rx(0.3, 0).cx(0, 3).rz(0.5, 3).cx(1, 2)
    fn = sharded_statevector_fn(qc, mesh)
    ct = tensorize(qc)
    p1 = np.array(ct.params)
    p2 = p1.copy()
    p2[0, 0] = 1.1
    psi1 = np.asarray(fn(p1))
    psi2 = np.asarray(fn(p2))
    assert not np.allclose(psi1, psi2)
    qc2 = Circuit(4).rx(1.1, 0).cx(0, 3).rz(0.5, 3).cx(1, 2)
    ref = np.asarray(statevector(tensorize(qc2)))
    np.testing.assert_allclose(psi2, ref, atol=1e-5)


def test_frame_method_matches_trajectory():
    """method='frame' reproduces method='trajectory' labels exactly:
    identical presampled Pauli choices → identical distributions."""
    from mlqem_tpu.device.registry import configurable_device
    from mlqem_tpu.parallel.datagen import IsingLabelPipeline

    dev = configurable_device(6, seed=0)
    J = np.linspace(0.1, 0.5, 8)
    kw = dict(nq=6, steps=3, dt=0.5, shots=None, n_traj=16)
    i1, n1 = IsingLabelPipeline(dev, method="trajectory",
                                **kw).generate(J, seed=3)
    i2, n2 = IsingLabelPipeline(dev, method="frame", **kw).generate(J, seed=3)
    np.testing.assert_allclose(i1, i2, atol=1e-6)
    np.testing.assert_allclose(n1, n2, atol=1e-5)


def test_frame_method_sharded_matches_unsharded():
    """The frame engine's label pipeline shards over the dp mesh."""
    from mlqem_tpu.device.registry import configurable_device
    from mlqem_tpu.parallel.datagen import IsingLabelPipeline
    from mlqem_tpu.parallel.mesh import make_mesh

    dev = configurable_device(4, seed=0)
    pipe = IsingLabelPipeline(dev, nq=4, steps=2, dt=0.5, shots=None,
                              method="frame", n_traj=8)
    J = np.linspace(0.1, 0.5, 16)
    i0, n0 = pipe.generate(J, seed=1)
    mesh = make_mesh()
    i1, n1 = pipe.generate(J, seed=1, mesh=mesh)
    np.testing.assert_allclose(i0, i1, atol=1e-6)
    np.testing.assert_allclose(n0, n1, atol=1e-5)
