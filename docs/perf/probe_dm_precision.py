"""Precision ladder for the exact dm path: DEFAULT vs HIGH vs HIGHEST.

JAX matmul precision on TPU: DEFAULT = one bf16 pass (~1e-3 relative on
these contractions), HIGH = 3-pass bf16x3 (~f32-grade for most inputs),
HIGHEST = 6-pass true f32. The dm engine pins HIGHEST
(`ops/density_static._PREC`) at a measured 14% throughput cost over
DEFAULT; this probe asks whether HIGH buys the accuracy back at half the
matmul overhead — if max|Δdm(HIGH, HIGHEST)| stays ~1e-6 the cheaper pin
is just as exact (HIGHEST itself is 8.1e-7 from a CPU-f32 reference,
PERF.md r5).

Each precision runs in a SUBPROCESS (the knob is read once at import and
einsum precision is baked at trace time): the child times the bench dm
config (10q / 4 steps / batch 512) and dumps a small-config dm
(6q / 3 steps / batch 8) for the parent's cross-precision accuracy
comparison.  Usage:  python docs/perf/probe_dm_precision.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..")))  # run from a source checkout

CHILD = r"""
import json, os, sys, time
import numpy as np
import jax

prec = os.environ["MLQEM_DM_PRECISION"]
out_npy, out_json, batch, n_timed = sys.argv[1:5]
batch, n_timed = int(batch), int(n_timed)

from mlqem_tpu.device.registry import configurable_device
from mlqem_tpu.device.noise import NoiseModel, compile_noise_table
from mlqem_tpu.ops.density_static import run_density_static
from mlqem_tpu.parallel.datagen import IsingLabelPipeline, make_ising_template

# --- accuracy dm: 6q / 3 steps / batch 8 ------------------------------
dev6 = configurable_device(6, seed=0)
tmpl = make_ising_template(6, 3, "Z", 0.25, h=1.0)
vals = np.linspace(0.1, 0.5, 8, dtype=np.float32)[:, None]
ct = tmpl.bind(vals)
keys, table = compile_noise_table(tmpl.ct, NoiseModel.from_device(dev6))
# axon cannot transfer complex64 device->host: materialize fresh f32
# re/im planes inside the jitted program and pull those
import jax.numpy as jnp
pull = jax.jit(lambda p: (lambda d: (jnp.real(d).astype(jnp.float32),
                                     jnp.imag(d).astype(jnp.float32)))(
    run_density_static(tmpl.ct, p, keys, table)))
re, im = pull(ct.params)
np.save(out_npy, np.stack([np.asarray(re), np.asarray(im)]))

# --- throughput: the bench dm config ----------------------------------
dev = configurable_device(10, seed=0)
pipe = IsingLabelPipeline(dev, nq=10, steps=4, shots=10000, dt=0.25,
                          method="density_matrix")
rng = np.random.default_rng(0)
def run(seed):
    J = rng.uniform(0.05, 0.6, size=batch).astype(np.float32)
    return pipe.generate(J, seed=seed)
t0 = time.time(); run(0); compile_s = time.time() - t0
times = []
for s in range(1, 1 + n_timed):
    tb = time.time(); run(s); times.append(time.time() - tb)
times = sorted(times)
json.dump({"prec": prec, "compile_s": compile_s, "batch": batch,
           "times": times,
           "pairs_per_min_best": batch / times[0] * 60.0,
           "pairs_per_min_median": batch / times[len(times)//2] * 60.0},
          open(out_json, "w"))
"""


def main():
    from mlqem_tpu.utils.platform import tpu_compute_up

    if not tpu_compute_up(timeout_s=240):
        print("TPU tunnel down or compute-hung — probe aborted "
              "(rerun later)", file=sys.stderr)
        print(json.dumps({"probe": "dm_precision", "status": "tunnel_down"}))
        return
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) \
        if "--batch" in sys.argv else 512
    n_timed = int(sys.argv[sys.argv.index("--n") + 1]) \
        if "--n" in sys.argv else 5
    tmp = tempfile.mkdtemp(prefix="dmprec_")
    dms, rates = {}, {}
    for prec in ("highest", "high", "default"):
        npy = os.path.join(tmp, f"{prec}.npy")
        js = os.path.join(tmp, f"{prec}.json")
        env = dict(os.environ, MLQEM_DM_PRECISION=prec)
        r = subprocess.run(
            [sys.executable, "-c", CHILD, npy, js, str(batch), str(n_timed)],
            env=env, timeout=3600)
        if r.returncode != 0:
            print(f"{prec}: child failed rc={r.returncode}", file=sys.stderr)
            continue
        import numpy as np
        dms[prec] = np.load(npy)
        rates[prec] = json.load(open(js))
        rr = rates[prec]
        print(f"{prec:8s}: best {rr['pairs_per_min_best']:>9,.0f}/min  "
              f"median {rr['pairs_per_min_median']:>9,.0f}/min  "
              f"per-batch {rr['times']}", flush=True)
    import numpy as np
    ref = dms.get("highest")
    if ref is not None:
        for prec, dm in dms.items():
            if prec == "highest":
                continue
            print(f"max|Δdm({prec}, highest)| = "
                  f"{float(np.max(np.abs(dm - ref))):.3e}")


if __name__ == "__main__":
    main()
