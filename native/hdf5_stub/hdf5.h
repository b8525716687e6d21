/* Minimal HDF5 stand-in used to build the *actual* reference binary
 * (jakovdev/SequenceAligner) in this image, where libhdf5 dev headers are
 * absent.  Two purposes:
 *
 *   1. perf baseline: `-W` runs never reach these calls, and `-B` align-phase
 *      timings are unaffected either way;
 *   2. score parity: full-mode H5Dwrite() payloads (the complete int32 N x N
 *      similarity matrix, /root/reference/src/io/format/hdf5.c:103) are
 *      dumped verbatim to "<output>.rawdump" so the reference binary's scores
 *      can be compared bit-for-bit against this framework's engine.
 *
 * Only the 20-odd H5* symbols the reference uses are provided.  This is NOT
 * an HDF5 implementation; triangular-mode hyperslab writes are captured by
 * offset so the row windows land in the right place in the dump.
 */
#ifndef HDF5_STUB_H
#define HDF5_STUB_H
#include <stdint.h>
#include <stddef.h>
#include <stdio.h>
#include <string.h>

typedef int64_t hid_t;
typedef uint64_t hsize_t;
typedef int herr_t;

#define H5F_ACC_TRUNC 2u
#define H5P_DEFAULT 0
#define H5P_FILE_ACCESS 101
#define H5P_DATASET_CREATE 102
#define H5S_ALL 0
#define H5T_STD_I32LE 1
#define H5T_NATIVE_INT32 1
#define H5T_C_S1 2
#define H5T_VARIABLE ((size_t)-1)
#define H5S_SELECT_SET 0
#define H5F_LIBVER_LATEST 5
typedef int H5F_libver_t;

/* Capture state (single-threaded writer in the reference). */
static char h5stub_path[4096];
static FILE *h5stub_file;
/* The reference's triangular path creates one mem dataspace per row chunk
 * (hdf5.c:171), so ids keep growing; 64 slots (vs the datasets' handful)
 * keeps the masked indexing from aliasing in-use spaces for any realistic
 * chunk count, and the matrix dims are additionally PINNED at H5Dcreate
 * time (h5stub_mat_dims) so H5Dwrite never depends on the shared table. */
static hsize_t h5stub_dims[64][4];  /* dataspace id -> dims (rank <= 2) */
static int h5stub_nspaces;
static int h5stub_mat_space = -1;   /* dataspace of the i32 matrix dataset */
static hsize_t h5stub_mat_dims[4];  /* matrix dims, pinned at create time */
static int h5stub_dset_space[8];    /* dataset id -> its dataspace */
static int h5stub_ndsets;
static hsize_t h5stub_sel_start[4], h5stub_sel_count[4]; /* last hyperslab */
static int h5stub_sel_active;

static inline hid_t H5Pcreate(hid_t c) { (void)c; return 1; }
static inline herr_t H5Pset_libver_bounds(hid_t p, int lo, int hi) { (void)p; (void)lo; (void)hi; return 0; }
static inline herr_t H5Pset_alignment(hid_t p, hsize_t t, hsize_t a) { (void)p; (void)t; (void)a; return 0; }
static inline herr_t H5Pset_chunk(hid_t p, int n, const hsize_t *d) { (void)p; (void)n; (void)d; return 0; }
static inline herr_t H5Pset_deflate(hid_t p, unsigned l) { (void)p; (void)l; return 0; }
static inline herr_t H5Pclose(hid_t p) { (void)p; return 0; }

static inline hid_t H5Fcreate(const char *n, unsigned f, hid_t c, hid_t a) {
    (void)f; (void)c; (void)a;
    snprintf(h5stub_path, sizeof h5stub_path, "%s.rawdump", n);
    h5stub_file = fopen(h5stub_path, "wb");
    return h5stub_file ? 1 : -1;
}
static inline herr_t H5Fclose(hid_t f) {
    (void)f;
    if (h5stub_file) { fclose(h5stub_file); h5stub_file = 0; }
    return 0;
}

static inline hid_t H5Screate_simple(int r, const hsize_t *d, const hsize_t *m) {
    (void)m;
    int id = h5stub_nspaces++;
    for (int k = 0; k < r && k < 4; k++) h5stub_dims[id & 63][k] = d[k];
    for (int k = r; k < 4; k++) h5stub_dims[id & 63][k] = 1;
    return 16 + id;
}
static inline herr_t H5Sclose(hid_t s) { (void)s; return 0; }
static inline hid_t H5Tcopy(hid_t t) { (void)t; return 2; }
static inline herr_t H5Tset_size(hid_t t, size_t s) { (void)t; (void)s; return 0; }
static inline herr_t H5Tclose(hid_t t) { (void)t; return 0; }

static inline hid_t H5Dcreate2(hid_t f, const char *n, hid_t t, hid_t s, hid_t l, hid_t c, hid_t a) {
    (void)f; (void)l; (void)c; (void)a;
    int id = h5stub_ndsets++;
    h5stub_dset_space[id & 7] = (int)(s - 16);
    /* the matrix dataset is the int32 one; pin its dims NOW (the shared
     * dims table slot may be reused by later mem dataspaces) */
    if (t == H5T_STD_I32LE && strstr(n, "matrix")) {
        h5stub_mat_space = (int)(s - 16);
        for (int k = 0; k < 4; k++)
            h5stub_mat_dims[k] = h5stub_dims[(s - 16) & 63][k];
    }
    return 32 + id;
}
#define H5Dcreate H5Dcreate2
static inline hid_t H5Dget_space(hid_t d) { return 16 + h5stub_dset_space[(d - 32) & 7]; }
static inline herr_t H5Sselect_hyperslab(hid_t s, int op, const hsize_t *start,
                                         const hsize_t *stride, const hsize_t *count,
                                         const hsize_t *block) {
    (void)s; (void)op; (void)stride; (void)block;
    for (int k = 0; k < 4; k++) { h5stub_sel_start[k] = start ? start[k] : 0; h5stub_sel_count[k] = count ? count[k] : 1; }
    h5stub_sel_active = 1;
    return 0;
}
static inline herr_t H5Dwrite(hid_t d, hid_t t, hid_t ms, hid_t fs, hid_t x, const void *buf) {
    (void)ms; (void)x;
    if (!h5stub_file) return 0;
    int sp = (d - 32) >= 0 && (d - 32) < 8 ? h5stub_dset_space[(d - 32) & 7] : -1;
    if (t != H5T_STD_I32LE || sp != h5stub_mat_space || sp < 0) return 0; /* skip /sequences */
    hsize_t cols = h5stub_mat_dims[1];
    if (fs != H5S_ALL && h5stub_sel_active) {
        /* triangular conversion path: row-window at (start[0], 0) */
        long off = (long)(h5stub_sel_start[0] * cols * sizeof(int32_t));
        fseek(h5stub_file, off, SEEK_SET);
        fwrite(buf, sizeof(int32_t), (size_t)(h5stub_sel_count[0] * cols), h5stub_file);
        h5stub_sel_active = 0;
    } else {
        hsize_t rows = h5stub_mat_dims[0];
        fseek(h5stub_file, 0, SEEK_SET);
        fwrite(buf, sizeof(int32_t), (size_t)(rows * cols), h5stub_file);
    }
    return 0;
}
static inline herr_t H5Dclose(hid_t d) { (void)d; return 0; }

#endif /* HDF5_STUB_H */
