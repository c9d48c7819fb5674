// Native TU-format file reader — host-side data-loader acceleration.
//
// TPU-native counterpart of the reference's TU ingest (gckn/data_io.py
// parses *_A.txt / *_graph_indicator.txt / label and attribute files with
// Python per-line loops). One C call slurps a whole file and tokenizes
// integers or float rows into caller-provided buffers; the grouping
// logic stays in numpy (feta_tmlr_tpu/data/tu.py), which is already
// vectorized. Separators handled: whitespace, commas, newlines — the
// exact set the Python parser accepts (tu.py:63, :74).
//
// Semantics bit-match the Python parser (tests/test_collate_native.py::
// test_tu_native_parse_matches_python on the committed TUFIX fixture).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// Read the whole file into a NUL-terminated heap buffer. Returns nullptr
// on IO failure; *len receives the byte count.
char* slurp(const char* path, long long* len) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    std::fseek(f, 0, SEEK_END);
    long long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    char* buf = static_cast<char*>(std::malloc(n + 1));
    if (!buf) { std::fclose(f); return nullptr; }
    long long got = static_cast<long long>(std::fread(buf, 1, n, f));
    std::fclose(f);
    buf[got] = '\0';
    *len = got;
    return buf;
}

inline bool is_sep(char c) {
    return c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == ',';
}

}  // namespace

extern "C" {

// Tokenize a file of integers (any separator mix). Writes up to `cap`
// values into `out`; returns the total token count (which may exceed
// `cap` — callers size `cap` from the file length, so this is a
// defensive contract, not an expected path), or -1 on IO error.
long long tu_read_ints(const char* path, long long* out, long long cap) {
    long long len = 0;
    char* buf = slurp(path, &len);
    if (!buf) return -1;
    long long count = 0;
    const char* p = buf;
    const char* end = buf + len;
    while (p < end) {
        while (p < end && is_sep(*p)) ++p;
        if (p >= end) break;
        char* next = nullptr;
        long long v = std::strtoll(p, &next, 10);
        if (next == p) { ++p; continue; }  // stray non-numeric byte
        if (count < cap) out[count] = v;
        ++count;
        p = next;
    }
    std::free(buf);
    return count;
}

// Tokenize a file of floats, also counting data rows (non-empty lines).
// Returns the token count (may exceed cap; see tu_read_ints) or -1;
// *n_rows receives the number of non-empty lines.
long long tu_read_floats(const char* path, float* out, long long cap,
                         long long* n_rows) {
    long long len = 0;
    char* buf = slurp(path, &len);
    if (!buf) return -1;
    long long count = 0, rows = 0;
    bool line_has_token = false;
    const char* p = buf;
    const char* end = buf + len;
    while (p <= end) {
        char c = (p < end) ? *p : '\n';
        if (c == '\n') {
            if (line_has_token) ++rows;
            line_has_token = false;
            ++p;
            continue;
        }
        if (is_sep(c)) { ++p; continue; }
        char* next = nullptr;
        float v = std::strtof(p, &next);
        if (next == p) { ++p; continue; }
        if (count < cap) out[count] = v;
        ++count;
        line_has_token = true;
        p = next;
    }
    std::free(buf);
    *n_rows = rows;
    return count;
}

}  // extern "C"
