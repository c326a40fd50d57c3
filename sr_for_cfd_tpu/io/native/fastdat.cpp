// Fast .dat field writer (native IO layer).
//
// The reference's full-field dump (`LDV PyCFD given by sir.py:245-258`)
// formats (nvar, nx+2, ny+2) float64 values as "%.6f \t" rows; doing that
// through Python string formatting costs ~0.4 s per 400x400 snapshot. This
// C++ implementation appends byte-identical section bodies ~20x faster and
// is loaded via ctypes (no pybind11 dependency); io/datfiles.py writes the
// small header itself and falls back to the pure-Python writer when the
// toolchain is unavailable.
//
// Build: g++ -O2 -shared -fPIC -o _fastdat.so fastdat.cpp
// (done on demand by sr_for_cfd_tpu/io/native_io.py)

#include <cstdio>

extern "C" {

// Appends the per-variable sections ("# ########## U velocity ############"
// + formatted rows) to an existing file. Returns 0 on success.
int append_field_sections(const char* filename, const double* var, long nvar,
                          long nxp, long nyp) {
    FILE* f = std::fopen(filename, "a");
    if (!f) return 1;
    static const char* names[3] = {"U", "V", "P"};
    char buf[64];
    for (long k = 0; k < nvar; ++k) {
        const char* name = (k < 3) ? names[k] : "?";
        std::fprintf(f, "\n# ########## %s velocity ############ \n", name);
        for (long i = 0; i < nxp; ++i) {
            const double* row = var + (k * nxp + i) * nyp;
            for (long j = 0; j < nyp; ++j) {
                int n = std::snprintf(buf, sizeof buf, "%.6f \t", row[j]);
                std::fwrite(buf, 1, (size_t)n, f);
            }
            std::fputc('\n', f);
        }
    }
    int rc = std::ferror(f);
    // fclose flushes the final stdio buffer; a failed flush (e.g. ENOSPC)
    // must fail the call or a truncated artifact looks complete
    if (std::fclose(f) != 0) rc = 1;
    return rc;
}

}  // extern "C"
