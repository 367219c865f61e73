"""Tutorial 04 — VQE with learned mitigation (the T7 application)."""
from mlqem_tpu import get_device
from mlqem_tpu.apps.chemistry import load_h2_problems
from mlqem_tpu.workflows.vqe_study import (train_vqe_processor, vqe_dataset,
                                           vqe_mitigation_study)

dev = get_device("fake_lima")
data = vqe_dataset(dev, samples_per_pauli=60, shots=10000, seed=0)
processor, stats = train_vqe_processor(dev, data)
print("processor training:", stats)

length, fci, ham = load_h2_problems()[4]   # near-equilibrium H2
out = vqe_mitigation_study(dev, ham, processor, maxiter=60, shots=10000)
print(f"H2 @ {length} A: exact {out['exact']:.5f}")
for arm in ("ideal", "noisy", "mitigated"):
    print(f"  {arm:9s}: {out[arm]:.5f}")
print(f"error: noisy {out['error_noisy']:.5f} -> "
      f"mitigated {out['error_mitigated']:.5f}")
