"""ctypes bindings for the native encoder kernels (with Python fallback).

The C++ sources live in ``native/``; they compile on first use into a cache
directory (``~/.cache/mlqem_tpu``) with the system compiler. Every entry
point has a pure-Python fallback, so the framework works without a
toolchain — the native path just makes host-side feature extraction for
large heterogeneous circuit datasets ~50x faster.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "encoders.cpp")


def _cache_dir() -> str:
    d = os.environ.get("MLQEM_NATIVE_CACHE",
                       os.path.expanduser("~/.cache/mlqem_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def load_native() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = _source_path()
    if not os.path.exists(src):
        return None
    out = os.path.join(_cache_dir(), "libmlqem_native.so")
    try:
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            for cc in ("c++", "g++", "cc"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-shared", "-fPIC", src, "-o", out],
                        check=True, capture_output=True, timeout=120)
                    break
                except (FileNotFoundError, subprocess.CalledProcessError):
                    continue
            else:
                return None
        lib = ctypes.CDLL(out)
    except OSError:
        return None

    ip = ctypes.POINTER(ctypes.c_int)
    lp = ctypes.POINTER(ctypes.c_long)
    dp = ctypes.POINTER(ctypes.c_double)
    up = ctypes.POINTER(ctypes.c_ubyte)
    lib.count_gates_batch.argtypes = [ip, lp, ctypes.c_long, ctypes.c_int,
                                      ip]
    lib.angle_hist_batch.argtypes = [dp, up, lp, ctypes.c_long,
                                     ctypes.c_int, ip]
    lib.wire_edges_batch.argtypes = [ip, lp, ctypes.c_long, ctypes.c_int,
                                     ip, ip, lp, lp, ip]
    _LIB = lib
    return _LIB


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


# ---------------------------------------------------------------------------
# flattening + dispatch
# ---------------------------------------------------------------------------
def flatten_circuits(circuits, kind_index) -> dict:
    """Flatten circuits into the native layout.

    kind_index: dict gate-name → vocabulary index (-1 = not counted).
    """
    from ..circuits.gates import ROTATION_GATES

    kinds: List[int] = []
    qubits: List[Tuple[int, int]] = []
    params: List[float] = []
    is_rot: List[int] = []
    offsets = [0]
    max_q = 1
    for qc in circuits:
        for op in qc.ops:
            kinds.append(kind_index.get(op.name, -1))
            q0 = op.qubits[0] if op.qubits else 0
            q1 = op.qubits[1] if len(op.qubits) > 1 else -1
            qubits.append((q0, q1))
            rot = (op.name in ROTATION_GATES and len(op.qubits) == 1
                   and op.params and isinstance(op.params[0], float))
            params.append(float(op.params[0]) if rot else 0.0)
            is_rot.append(1 if rot else 0)
        offsets.append(len(kinds))
        max_q = max(max_q, qc.num_qubits)
    return {
        "kinds": np.asarray(kinds, np.int32),
        "qubits": np.asarray(qubits, np.int32).reshape(-1, 2),
        "params": np.asarray(params, np.float64),
        "is_rot": np.asarray(is_rot, np.uint8),
        "offsets": np.asarray(offsets, np.int64),
        "max_qubits": max_q,
    }


def count_gates_batch(flat: dict, n_kinds: int) -> np.ndarray:
    """[n_circuits, n_kinds] gate-type counts (native or fallback)."""
    n_c = flat["offsets"].shape[0] - 1
    out = np.zeros((n_c, n_kinds), np.int32)
    lib = load_native()
    if lib is not None:
        lib.count_gates_batch(_ptr(flat["kinds"], ctypes.c_int),
                              _ptr(flat["offsets"], ctypes.c_long),
                              n_c, n_kinds, _ptr(out, ctypes.c_int))
        return out
    offs = flat["offsets"]
    for c in range(n_c):
        seg = flat["kinds"][offs[c]:offs[c + 1]]
        seg = seg[(seg >= 0) & (seg < n_kinds)]
        np.add.at(out[c], seg, 1)
    return out


def angle_hist_batch(flat: dict, n_bins: int) -> np.ndarray:
    """[n_circuits, n_bins] rotation-angle histograms over [-2π, 2π]."""
    n_c = flat["offsets"].shape[0] - 1
    out = np.zeros((n_c, n_bins), np.int32)
    lib = load_native()
    if lib is not None:
        lib.angle_hist_batch(_ptr(flat["params"], ctypes.c_double),
                             _ptr(flat["is_rot"], ctypes.c_ubyte),
                             _ptr(flat["offsets"], ctypes.c_long),
                             n_c, n_bins, _ptr(out, ctypes.c_int))
        return out
    offs = flat["offsets"]
    edges = np.linspace(-2 * np.pi, 2 * np.pi, n_bins + 1)
    for c in range(n_c):
        sel = flat["is_rot"][offs[c]:offs[c + 1]].astype(bool)
        angles = flat["params"][offs[c]:offs[c + 1]][sel]
        out[c], _ = np.histogram(angles, bins=edges)
    return out


def fast_encode_data(circuits, properties: dict, ideal_exp_vals,
                     noisy_exp_vals, num_qubits: int, meas_bases=None):
    """Native-accelerated drop-in for :func:`mlqem_tpu.data.encoders.
    encode_data` (identical output, batch-vectorized hot loops)."""
    from ..data.encoders import _normalize_noisy, device_stat_vector

    noisy_exp_vals = _normalize_noisy(noisy_exp_vals)
    gates_set = sorted(properties["gates_set"])
    if meas_bases is None:
        meas_bases = [[]]
    vec = device_stat_vector(properties)
    n_bins = 40
    width = (len(vec) + len(gates_set) + n_bins + num_qubits
             + len(meas_bases[0]))
    X = np.zeros((len(circuits), width), np.float32)
    X[:, :len(vec)] = vec[None, :]
    kind_index = {g: i for i, g in enumerate(gates_set)}
    flat = flatten_circuits(circuits, kind_index)
    g0 = len(vec)
    a0 = g0 + len(gates_set)
    e0 = a0 + n_bins
    m0 = e0 + num_qubits
    X[:, g0:a0] = count_gates_batch(flat, len(gates_set)) * 0.01
    X[:, a0:e0] = angle_hist_batch(flat, n_bins) * 0.01
    X[:, e0:m0] = np.asarray(noisy_exp_vals, np.float32).reshape(
        len(circuits), num_qubits)
    if meas_bases != [[]]:
        X[:, m0:] = np.asarray(meas_bases, np.float32)
    y = np.asarray(ideal_exp_vals, np.float32)
    return X, y


def wire_edges_batch(flat: dict) -> List[np.ndarray]:
    """Per-circuit op→op wire edge lists: [2, n_edges] int32 each.

    NOTE: covers ops with ≤ 2 qubit operands (the simulator vocabulary);
    the canonical graph encoder (``data/graph.py``) remains the parity path
    for circuits containing all-qubit barriers."""
    offs = flat["offsets"]
    n_c = offs.shape[0] - 1
    lib = load_native()
    if lib is not None:
        cap_per = 2 * np.diff(offs)
        edge_offsets = np.zeros(n_c, np.int64)
        np.cumsum(cap_per[:-1], out=edge_offsets[1:])
        total = int(cap_per.sum())
        src = np.zeros(total, np.int32)
        dst = np.zeros(total, np.int32)
        counts = np.zeros(n_c, np.int64)
        scratch = np.zeros(flat["max_qubits"], np.int32)
        lib.wire_edges_batch(_ptr(flat["qubits"], ctypes.c_int),
                             _ptr(offs, ctypes.c_long), n_c,
                             flat["max_qubits"],
                             _ptr(src, ctypes.c_int),
                             _ptr(dst, ctypes.c_int),
                             _ptr(edge_offsets, ctypes.c_long),
                             _ptr(counts, ctypes.c_long),
                             _ptr(scratch, ctypes.c_int))
        return [np.stack([src[edge_offsets[c]:edge_offsets[c] + counts[c]],
                          dst[edge_offsets[c]:edge_offsets[c] + counts[c]]])
                for c in range(n_c)]
    # fallback
    out = []
    for c in range(n_c):
        last: dict = {}
        es, ed = [], []
        for local, i in enumerate(range(offs[c], offs[c + 1])):
            q0, q1 = flat["qubits"][i]
            for q in (q0, q1):
                if q < 0:
                    continue
                if q in last:
                    es.append(last[q])
                    ed.append(local)
                last[q] = local
        out.append(np.asarray([es, ed], np.int32).reshape(2, -1))
    return out
