// Fast LFP trace-string parser (native data-loader component).
//
// The BigQuery export can deliver traces as decimal strings
// "[v1, v2, ...]" (reference temporal_vit/data/preprocessing_core.py:6-19
// parses them per-cell with numpy). At dataset scale that is ~77k strings
// of ~5000 floats on the ingest path; this translation unit parses a whole
// column in one C call: a tight strtof loop with no intermediate Python
// objects, writing straight into the caller's dense (n, out_len) float32
// buffer that feeds jax.device_put.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -shared -fPIC -o libtraceparse.so trace_parser.cpp

#include <cstdlib>
#include <cstring>

extern "C" {

// Parse one "[v1, v2, ...]" (or bare "v1 v2 ...") string into out[0..cap).
// Returns the number of values parsed (may exceed cap; excess is dropped).
long parse_trace_string(const char* str, float* out, long cap) {
    if (str == nullptr) return 0;
    const char* p = str;
    long count = 0;
    while (*p != '\0') {
        // Skip separators / brackets / whitespace.
        while (*p == '[' || *p == ']' || *p == ',' || *p == ' ' ||
               *p == '\t' || *p == '\n' || *p == '\r') {
            ++p;
        }
        if (*p == '\0') break;
        char* end = nullptr;
        float v = strtof(p, &end);
        if (end == p) {  // unparseable token: skip one char defensively
            ++p;
            continue;
        }
        if (count < cap) out[count] = v;
        ++count;
        p = end;
    }
    return count;
}

// Parse a column of n trace strings into a dense (n, out_len) row-major
// buffer. valid[i] = 1 iff string i yielded >= out_len values (short/empty
// traces leave their row zeroed, matching the Python path's validity mask).
void parse_trace_column(const char** strs, long n, long out_len,
                        float* out, unsigned char* valid) {
    for (long i = 0; i < n; ++i) {
        float* row = out + i * out_len;
        long got = parse_trace_string(strs[i], row, out_len);
        if (got >= out_len) {
            valid[i] = 1;
        } else {
            valid[i] = 0;
            memset(row, 0, sizeof(float) * out_len);
        }
    }
}

}  // extern "C"
