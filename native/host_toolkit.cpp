// knpemi_tpu native host toolkit.
//
// Host-side mesh/graph preprocessing kernels that are Python-loop-bound
// in pure numpy/scipy — the counterpart of the reference stack's native
// layers (dolfinx C++ topology, hypre setup; SURVEY.md section 2.3).
// Exposed through ctypes (knpemi_tpu/utils/native.py) with pure-Python
// fallbacks, so the framework works without compilation.
//
// Build: make -C native    (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <vector>

extern "C" {

// Vanek root-node aggregation on a strength-filtered CSR graph
// (solvers/mg.py).  agg must be length n; returns the aggregate count.
int64_t vanek_aggregate(int64_t n, const int64_t* indptr,
                        const int32_t* indices, int64_t* agg) {
  for (int64_t i = 0; i < n; ++i) agg[i] = -1;
  int64_t nc = 0;
  // phase 1: roots whose whole strong neighborhood is free
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] >= 0) continue;
    bool free_nb = true;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      if (agg[indices[p]] != -1) { free_nb = false; break; }
    }
    if (free_nb) {
      for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
        agg[indices[p]] = nc;
      agg[i] = nc;
      ++nc;
    }
  }
  // phase 2: attach stragglers to a strongly-connected aggregate
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] >= 0) continue;
    int64_t found = -2;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t a = agg[indices[p]];
      if (a >= 0) { found = a; break; }
    }
    agg[i] = found;
  }
  // phase 3: isolated leftovers become singletons
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] == -2) agg[i] = nc++;
  }
  return nc;
}

// Facet -> (cell, cell) adjacency from sorted facet keys: given the
// flattened per-cell facet ids (already mapped to unique facet indices)
// fill the two-slot facet_cells table.  Mirrors mesh/core.py.
void facet_cells_fill(int64_t n_entries, const int64_t* facet_of_entry,
                      const int64_t* cell_of_entry, int64_t n_facets,
                      int64_t* facet_cells /* 2*n_facets, init -1 */) {
  for (int64_t e = 0; e < n_entries; ++e) {
    int64_t f = facet_of_entry[e];
    int64_t* slot = facet_cells + 2 * f;
    if (slot[0] < 0) slot[0] = cell_of_entry[e];
    else slot[1] = cell_of_entry[e];
  }
}

}  // extern "C"
