// Host-side simple-path enumerator for GCKN path features.
//
// TPU-native equivalent of the reference's Cython DFS
// (/root/reference/gckn/graphs/graphs_fast.pyx:87-197): for every start node
// enumerate all simple paths (no repeated nodes) with exactly s nodes, for
// s = 1..k, in DFS order grouped by start node. Irregular DFS stays on the
// host (it cannot map to the MXU); outputs feed static-shaped device
// buffers. C++/ctypes replaces Cython (build: native/Makefile).
//
// Also provides walks (repeated nodes allowed, no immediate backtracking —
// graphs_fast.pyx:110-129).
//
// API (ctypes, all int32 except totals):
//   count_paths(indptr, indices, n, k, counts)   counts: [k * n] paths with
//     (s+1 nodes? no:) exactly s+1... see below; returns 0 on success.
//   fill_paths(indptr, indices, n, k, out_s, ...) fills flattened paths.
//
// Layout: for size s (1-based number of nodes), paths_s is a flattened
// [n_paths_s, s] int32 array, rows grouped by start node in node order;
// counts[(s-1)*n + u] = number of size-s paths starting at u.

#include <cstdint>
#include <vector>

namespace {

struct DFSState {
    const int32_t* indptr;
    const int32_t* indices;
    int32_t n;
    int32_t k;
    std::vector<char> visited;
    std::vector<int32_t> stack_node;

    // counting mode
    int64_t* counts;  // [k * n]
    // filling mode
    int32_t** outs;      // k pointers, outs[s-1] flattened [*, s]
    int64_t* fill_pos;   // per size write cursor (in rows)

    void dfs_count(int32_t start) {
        // iterative DFS enumerating simple paths up to k nodes
        std::vector<int32_t> path;
        std::vector<int32_t> iter_stack;  // adjacency cursor per depth
        path.push_back(start);
        visited[start] = 1;
        counts[(0) * n + start] += 1;  // size-1 path
        iter_stack.push_back(indptr[start]);
        while (!path.empty()) {
            int32_t u = path.back();
            int32_t& it = iter_stack.back();
            bool descended = false;
            if ((int32_t)path.size() < k) {
                while (it < indptr[u + 1]) {
                    int32_t v = indices[it++];
                    if (!visited[v]) {
                        path.push_back(v);
                        visited[v] = 1;
                        counts[(int64_t)(path.size() - 1) * n + start] += 1;
                        iter_stack.push_back(indptr[v]);
                        descended = true;
                        break;
                    }
                }
            }
            if (!descended && (it >= indptr[u + 1] ||
                               (int32_t)path.size() >= k)) {
                visited[u] = 0;
                path.pop_back();
                iter_stack.pop_back();
            }
        }
    }

    void dfs_fill(int32_t start) {
        std::vector<int32_t> path;
        std::vector<int32_t> iter_stack;
        path.push_back(start);
        visited[start] = 1;
        emit(path);
        iter_stack.push_back(indptr[start]);
        while (!path.empty()) {
            int32_t u = path.back();
            int32_t& it = iter_stack.back();
            bool descended = false;
            if ((int32_t)path.size() < k) {
                while (it < indptr[u + 1]) {
                    int32_t v = indices[it++];
                    if (!visited[v]) {
                        path.push_back(v);
                        visited[v] = 1;
                        emit(path);
                        iter_stack.push_back(indptr[v]);
                        descended = true;
                        break;
                    }
                }
            }
            if (!descended && (it >= indptr[u + 1] ||
                               (int32_t)path.size() >= k)) {
                visited[u] = 0;
                path.pop_back();
                iter_stack.pop_back();
            }
        }
    }

    void emit(const std::vector<int32_t>& path) {
        int32_t s = (int32_t)path.size();
        int32_t* dst = outs[s - 1] + fill_pos[s - 1] * s;
        for (int32_t j = 0; j < s; ++j) dst[j] = path[j];
        fill_pos[s - 1] += 1;
    }
};

}  // namespace

extern "C" {

// counts: zero-initialized int64[k * n]; counts[(s-1)*n + u] = #size-s paths
// starting at node u.
int count_paths(const int32_t* indptr, const int32_t* indices,
                int32_t n, int32_t k, int64_t* counts) {
    DFSState st;
    st.indptr = indptr;
    st.indices = indices;
    st.n = n;
    st.k = k;
    st.counts = counts;
    st.visited.assign(n, 0);
    for (int32_t u = 0; u < n; ++u) st.dfs_count(u);
    return 0;
}

// outs: k pointers; outs[s-1] must hold sum_u counts[(s-1)*n+u] rows of s
// int32s. Rows are written grouped by start node in ascending node order.
int fill_paths(const int32_t* indptr, const int32_t* indices,
               int32_t n, int32_t k, int32_t** outs) {
    DFSState st;
    st.indptr = indptr;
    st.indices = indices;
    st.n = n;
    st.k = k;
    st.outs = outs;
    std::vector<int64_t> pos(k, 0);
    st.fill_pos = pos.data();
    st.visited.assign(n, 0);
    for (int32_t u = 0; u < n; ++u) st.dfs_fill(u);
    return 0;
}

// ---- walks (repeated nodes allowed, no immediate backtracking) ----------
// graphs_fast.pyx:110-129 semantics: a walk of size s from u follows any
// edges but never returns directly to the node it just came from.

static void walk_count(const int32_t* indptr, const int32_t* indices,
                       int32_t n, int32_t k, int64_t* counts,
                       std::vector<int32_t>& path, int32_t start) {
    int32_t s = (int32_t)path.size();
    counts[(int64_t)(s - 1) * n + start] += 1;
    if (s >= k) return;
    int32_t u = path.back();
    int32_t prev = s >= 2 ? path[s - 2] : -1;
    for (int32_t it = indptr[u]; it < indptr[u + 1]; ++it) {
        int32_t v = indices[it];
        if (v == prev) continue;
        path.push_back(v);
        walk_count(indptr, indices, n, k, counts, path, start);
        path.pop_back();
    }
}

static void walk_fill(const int32_t* indptr, const int32_t* indices,
                      int32_t n, int32_t k, int32_t** outs,
                      int64_t* pos, std::vector<int32_t>& path) {
    int32_t s = (int32_t)path.size();
    int32_t* dst = outs[s - 1] + pos[s - 1] * s;
    for (int32_t j = 0; j < s; ++j) dst[j] = path[j];
    pos[s - 1] += 1;
    if (s >= k) return;
    int32_t u = path.back();
    int32_t prev = s >= 2 ? path[s - 2] : -1;
    for (int32_t it = indptr[u]; it < indptr[u + 1]; ++it) {
        int32_t v = indices[it];
        if (v == prev) continue;
        path.push_back(v);
        walk_fill(indptr, indices, n, k, outs, pos, path);
        path.pop_back();
    }
}

int count_walks(const int32_t* indptr, const int32_t* indices,
                int32_t n, int32_t k, int64_t* counts) {
    std::vector<int32_t> path;
    for (int32_t u = 0; u < n; ++u) {
        path.clear();
        path.push_back(u);
        walk_count(indptr, indices, n, k, counts, path, u);
    }
    return 0;
}

int fill_walks(const int32_t* indptr, const int32_t* indices,
               int32_t n, int32_t k, int32_t** outs) {
    std::vector<int64_t> pos(k, 0);
    std::vector<int32_t> path;
    for (int32_t u = 0; u < n; ++u) {
        path.clear();
        path.push_back(u);
        walk_fill(indptr, indices, n, k, outs, pos.data(), path);
    }
    return 0;
}

}  // extern "C"
