// Native host-side encoder kernels.
//
// The TPU engines consume tensorized circuits; what remains on the host for
// general (non-template) datasets is per-circuit feature extraction — gate
// counting, rotation-angle histograms (the reference's encode_data hot loop,
// blackwater mlp.py:124-189) and the DAG wire-edge walk of the graph encoder
// (data/utils.py:225-353). These are Python-loop bound at ~1-5 ms/circuit;
// this library batch-processes flattened op streams at C speed.
//
// Layout contract (all little-endian, C-contiguous):
//   ops are concatenated across circuits; circuit c owns ops
//   [offsets[c], offsets[c+1]).
//   gate_kind:  int32[n_ops]   — caller-defined vocabulary index
//   qubits:     int32[n_ops*2] — q0, q1 (q1 = -1 for 1q ops)
//   params:     float64[n_ops] — first parameter (rotation angle) or 0
//   is_rotation:uint8[n_ops]   — 1 if the op counts toward angle bins
//
// Build: cc -O3 -shared -fPIC encoders.cpp -o libmlqem_native.so
extern "C" {

// Per-circuit gate-type counts: out[c * n_kinds + k] += 1
void count_gates_batch(const int* gate_kind, const long* offsets,
                       long n_circuits, int n_kinds, int* out) {
    for (long c = 0; c < n_circuits; ++c) {
        int* row = out + c * n_kinds;
        for (long i = offsets[c]; i < offsets[c + 1]; ++i) {
            int k = gate_kind[i];
            if (k >= 0 && k < n_kinds) row[k] += 1;
        }
    }
}

// Rotation-angle histogram over [-2π, 2π) with n_bins uniform bins
// (reference bin convention: np.histogram over arange(-2π, 2π+w, w)).
void angle_hist_batch(const double* params, const unsigned char* is_rot,
                      const long* offsets, long n_circuits, int n_bins,
                      int* out) {
    const double lo = -6.283185307179586;
    const double hi = 6.283185307179586;
    const double w = (hi - lo) / n_bins;
    for (long c = 0; c < n_circuits; ++c) {
        int* row = out + c * n_bins;
        for (long i = offsets[c]; i < offsets[c + 1]; ++i) {
            if (!is_rot[i]) continue;
            double a = params[i];
            if (a < lo || a > hi) continue;
            int b = (int)((a - lo) / w);
            if (b == n_bins) b -= 1;  // right-edge inclusion, numpy parity
            if (b >= 0 && b < n_bins) row[b] += 1;
        }
    }
}

// DAG wire edges (op→op along each qubit): last-writer chaining.
// node indices are per-circuit op positions (0-based within the circuit).
// Returns the number of edges written for circuit c in edge_counts[c];
// edges go to edge_src/edge_dst starting at edge_offsets[c] (caller sizes
// buffers with n_ops capacity — each op adds ≤ 2 edges but a wire edge is
// created per (op, qubit) with a predecessor, bounded by 2*n_ops).
void wire_edges_batch(const int* qubits, const long* offsets,
                      long n_circuits, int max_qubits,
                      int* edge_src, int* edge_dst,
                      const long* edge_offsets, long* edge_counts,
                      int* scratch_last /* int[max_qubits] workspace */) {
    for (long c = 0; c < n_circuits; ++c) {
        for (int q = 0; q < max_qubits; ++q) scratch_last[q] = -1;
        long w = edge_offsets[c];
        long n0 = offsets[c];
        for (long i = offsets[c]; i < offsets[c + 1]; ++i) {
            int local = (int)(i - n0);
            for (int s = 0; s < 2; ++s) {
                int q = qubits[2 * i + s];
                if (q < 0 || q >= max_qubits) continue;
                if (s == 1 && q == qubits[2 * i]) continue;  // 1q dup guard
                if (scratch_last[q] >= 0) {
                    edge_src[w] = scratch_last[q];
                    edge_dst[w] = local;
                    ++w;
                }
                scratch_last[q] = local;
            }
        }
        edge_counts[c] = w - edge_offsets[c];
    }
}

}  // extern "C"
