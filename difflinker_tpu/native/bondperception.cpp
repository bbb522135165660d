// Native evaluation kernels: geometric bond perception and connected
// components over batches of molecules.
//
// Role: the reference's "native tier" for chemistry is RDKit's C++ core and
// the OpenBabel binary (SURVEY.md §2); this module is the equivalent for the
// difflinker_tpu eval pipeline, where per-molecule O(N²) bond inference over
// hundreds of thousands of sampled molecules (250 linkers × test set) is the
// host-side hot loop. Semantics are identical to chem/bonds.py (threshold
// tables from src/const.py:68-139 + MARGINS_EDM), which remains the pure
// numpy fallback and the correctness oracle (tests/test_native.py).
//
// Built at import time by difflinker_tpu/native/__init__.py:
//   g++ -O3 -march=native -shared -fPIC bondperception.cpp -o libdlnative.so

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Bond orders for one molecule.
//   pos:   n x 3 float32 (Angstrom)
//   types: n int32 (GEOM vocab indices)
//   thr1/2/3: n_types x n_types float32 threshold tables in pm (-1 = no bond)
//   out:   n x n int8 bond orders (symmetric, zero diagonal)
void bond_orders(const double* pos, const int32_t* types, int n,
                 const float* thr1, const float* thr2, const float* thr3,
                 int n_types, int8_t* out) {
  std::memset(out, 0, (size_t)n * n);
  for (int i = 0; i < n; ++i) {
    const double xi = pos[3 * i], yi = pos[3 * i + 1], zi = pos[3 * i + 2];
    const int ti = types[i];
    for (int j = i + 1; j < n; ++j) {
      const double dx = xi - pos[3 * j];
      const double dy = yi - pos[3 * j + 1];
      const double dz = zi - pos[3 * j + 2];
      const double d_pm = 100.0 * std::sqrt(dx * dx + dy * dy + dz * dz);
      const int tj = types[j];
      const int idx = ti * n_types + tj;
      int8_t order = 0;
      const float t1 = thr1[idx];
      if (t1 > 0 && d_pm < t1) {
        order = 1;
        const float t2 = thr2[idx];
        if (t2 > 0 && d_pm < t2) {
          order = 2;
          const float t3 = thr3[idx];
          if (t3 > 0 && d_pm < t3) order = 3;
        }
      }
      out[(size_t)i * n + j] = order;
      out[(size_t)j * n + i] = order;
    }
  }
}

// Batched variant over padded arrays.
//   pos (B,N,3), types (B,N), n_atoms (B) real counts, out (B,N,N)
void bond_orders_batch(const double* pos, const int32_t* types,
                       const int32_t* n_atoms, int batch, int n_max,
                       const float* thr1, const float* thr2, const float* thr3,
                       int n_types, int8_t* out) {
  for (int b = 0; b < batch; ++b) {
    std::memset(out + (size_t)b * n_max * n_max, 0, (size_t)n_max * n_max);
    const int n = n_atoms[b];
    // write into the padded (N,N) slab row-by-row via a dense temporary
    const double* p = pos + (size_t)b * n_max * 3;
    const int32_t* t = types + (size_t)b * n_max;
    int8_t* o = out + (size_t)b * n_max * n_max;
    for (int i = 0; i < n; ++i) {
      const double xi = p[3 * i], yi = p[3 * i + 1], zi = p[3 * i + 2];
      const int ti = t[i];
      for (int j = i + 1; j < n; ++j) {
        const double dx = xi - p[3 * j];
        const double dy = yi - p[3 * j + 1];
        const double dz = zi - p[3 * j + 2];
        const double d_pm = 100.0 * std::sqrt(dx * dx + dy * dy + dz * dz);
        const int idx = ti * n_types + t[j];
        int8_t order = 0;
        const float t1 = thr1[idx];
        if (t1 > 0 && d_pm < t1) {
          order = 1;
          const float t2 = thr2[idx];
          if (t2 > 0 && d_pm < t2) {
            order = 2;
            const float t3 = thr3[idx];
            if (t3 > 0 && d_pm < t3) order = 3;
          }
        }
        o[(size_t)i * n_max + j] = order;
        o[(size_t)j * n_max + i] = order;
      }
    }
  }
}

// Connected components over an int8 adjacency (order matrix); labels out.
// Iterative DFS with an explicit stack (no recursion limits).
void connected_components(const int8_t* adj, int n, int32_t* labels) {
  for (int i = 0; i < n; ++i) labels[i] = -1;
  int32_t comp = 0;
  // stack storage
  int* stack = new int[n];
  for (int s = 0; s < n; ++s) {
    if (labels[s] != -1) continue;
    int top = 0;
    stack[top++] = s;
    labels[s] = comp;
    while (top) {
      const int v = stack[--top];
      const int8_t* row = adj + (size_t)v * n;
      for (int u = 0; u < n; ++u) {
        if (row[u] > 0 && labels[u] == -1) {
          labels[u] = comp;
          stack[top++] = u;
        }
      }
    }
    ++comp;
  }
  delete[] stack;
}

// Valence-validity check: per-atom bond-order sums within max_valence.
// Returns 1 if valid (every real atom bonded and within valence), else 0.
int32_t valence_valid(const int8_t* adj, const int32_t* types, int n,
                      const int32_t* max_valence) {
  if (n == 0) return 0;
  for (int i = 0; i < n; ++i) {
    int v = 0;
    const int8_t* row = adj + (size_t)i * n;
    for (int j = 0; j < n; ++j) v += row[j];
    if (v > max_valence[types[i]]) return 0;
    if (n > 1 && v == 0) return 0;
  }
  return 1;
}

}  // extern "C"
