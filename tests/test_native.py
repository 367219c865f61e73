"""Native encoder kernels: availability, parity with Python, speed."""
import time

import numpy as np
import pytest

from mlqem_tpu.circuits.families import random_circuit
from mlqem_tpu.data.encoders import encode_data
from mlqem_tpu.device.registry import get_device
from mlqem_tpu.utils import native

DEV = get_device("fake_lima")


def _circuits(n, seed=0):
    rng = np.random.default_rng(seed)
    return [random_circuit(4, int(rng.integers(2, 6)),
                           seed=int(rng.integers(2 ** 31)))
            for _ in range(n)]


def test_native_library_builds():
    lib = native.load_native()
    assert lib is not None, "native toolchain expected in this image"


def test_count_and_hist_parity_with_fallback():
    circs = _circuits(20)
    kind_index = {g: i for i, g in enumerate(
        sorted(DEV.properties()["gates_set"]))}
    flat = native.flatten_circuits(circs, kind_index)
    counts_native = native.count_gates_batch(flat, len(kind_index))
    hist_native = native.angle_hist_batch(flat, 40)
    edges_native = native.wire_edges_batch(flat)
    # force fallback path
    saved, native._LIB, native._TRIED = native._LIB, None, True
    try:
        counts_py = native.count_gates_batch(flat, len(kind_index))
        hist_py = native.angle_hist_batch(flat, 40)
        edges_py = native.wire_edges_batch(flat)
    finally:
        native._LIB, native._TRIED = saved, True
    np.testing.assert_array_equal(counts_native, counts_py)
    np.testing.assert_array_equal(hist_native, hist_py)
    for a, b in zip(edges_native, edges_py):
        np.testing.assert_array_equal(a, b)


def test_fast_encode_data_matches_reference_encoder():
    circs = _circuits(15, seed=3)
    props = DEV.properties()
    rng = np.random.default_rng(0)
    ideal = rng.uniform(-1, 1, (15, 4)).tolist()
    noisy = rng.uniform(-1, 1, (15, 4)).tolist()
    X_ref, y_ref = encode_data(circs, props, ideal, noisy, 4)
    X_fast, y_fast = native.fast_encode_data(circs, props, ideal, noisy, 4)
    np.testing.assert_allclose(X_fast, X_ref, atol=1e-6)
    np.testing.assert_allclose(y_fast, y_ref)


def test_native_speedup():
    circs = _circuits(300, seed=5)
    props = DEV.properties()
    vals = [[0.0] * 4] * 300
    t0 = time.perf_counter()
    native.fast_encode_data(circs, props, vals, vals, 4)
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    encode_data(circs, props, vals, vals, 4)
    t_py = time.perf_counter() - t0
    # the native path should never be slower; typically 10-100x faster
    assert t_fast < t_py
