// Native edge partitioner for the multi-chip graph paths.
//
// Host-side counterpart of feta_tmlr_tpu/parallel/edge_partition.py::
// partition_edges: bucket every directed edge (s, d) by
// (shard_of(d), shard_of(s)) with contiguous node sharding
// (shard_of(u) = u / nodes_per_shard), pad all S*S buckets to one
// static size, and emit shard-local indices. The pure-Python builder
// appends to S*S Python lists — O(E) interpreter work that dominates
// setup for the ring-attention / ring-SpMM regime (millions of edges on
// a giant graph; the reference has no distributed path at all,
// SURVEY.md §2.8). Two passes, both sequential streams over the edge
// list: count per bucket, then cursor-fill. Bucket-internal edge order
// is input order, bit-matching the Python twin
// (tests/test_edgepart_native.py).

#include <cstdint>

extern "C" {

// Pass 1: per-bucket counts. counts: [n_shards * n_shards] zeroed by the
// caller; returns the max bucket size (>= 1, the pad width).
int64_t edgepart_count(int64_t n_edges, const int32_t* src,
                       const int32_t* dst, int32_t vs, int32_t n_shards,
                       int64_t* counts) {
    for (int64_t e = 0; e < n_edges; ++e) {
        const int32_t d = dst[e] / vs;
        const int32_t s = src[e] / vs;
        ++counts[(int64_t)d * n_shards + s];
    }
    int64_t e_max = 1;
    const int64_t nb = (int64_t)n_shards * n_shards;
    for (int64_t b = 0; b < nb; ++b)
        if (counts[b] > e_max) e_max = counts[b];
    return e_max;
}

// Pass 2: fill the padded [S, S, e_max] buckets (outputs zeroed by the
// caller). cursors: [n_shards * n_shards] zeroed scratch.
int32_t edgepart_fill(int64_t n_edges, const int32_t* src,
                      const int32_t* dst, const float* w, int32_t vs,
                      int32_t n_shards, int64_t e_max, int64_t* cursors,
                      int32_t* src_local, int32_t* dst_local,
                      float* weight, uint8_t* mask) {
    for (int64_t e = 0; e < n_edges; ++e) {
        const int32_t d = dst[e] / vs;
        const int32_t s = src[e] / vs;
        const int64_t b = (int64_t)d * n_shards + s;
        const int64_t k = b * e_max + cursors[b]++;
        src_local[k] = src[e] - s * vs;
        dst_local[k] = dst[e] - d * vs;
        weight[k] = w[e];
        mask[k] = 1;
    }
    return 0;
}

}  // extern "C"
