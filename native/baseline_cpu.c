/* Reference-equivalent CPU baseline for bench.py.
 *
 * Measures the throughput (GCUPS) of the reference tool's CPU design on this
 * host: an OpenMP-parallel loop over the pair space where each thread fills a
 * full row-major Gotoh DP table per pair (the scheme of
 * /root/reference/src/bio/align.c + method/ga.c, reimplemented from the
 * recurrence spec in SURVEY.md §2.1 — no code copied).  Workload matches
 * bench.py: 1024 protein sequences, lengths uniform in [24, 64], BLOSUM62,
 * affine gaps open=-10 extend=-1, all-vs-all.
 *
 * Build:  gcc -O3 -march=native -fopenmp -o baseline_cpu baseline_cpu.c
 * Output: one JSON line {"gcups": X, "pairs_per_sec": Y}
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#ifdef _OPENMP
#include <omp.h>
#endif

#include "baseline_matrix.h"

#define N_SEQS 1024
#define LEN_LO 24
#define LEN_HI 64
#define GAP_OPN (-10)
#define GAP_EXT (-1)
#define SCORE_MIN_SENTINEL (INT32_MIN / 2)

/* xorshift PRNG: deterministic workload (distribution match with bench.py is
 * what matters, not the exact sequences). */
static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint64_t rng_next(void) {
    uint64_t x = rng_state;
    x ^= x << 13; x ^= x >> 7; x ^= x << 17;
    return rng_state = x;
}

static int lens[N_SEQS];
static int8_t *seqs[N_SEQS];

static int32_t ga_affine(const int8_t *s1, int l1, const int8_t *s2, int l2,
                         int32_t *h, int32_t *x, int32_t *y) {
    const int64_t cols = l1 + 1;
    h[0] = 0; x[0] = y[0] = SCORE_MIN_SENTINEL;
    for (int c = 1; c <= l1; c++) {
        int32_t opn = h[c - 1] + GAP_OPN, ext = x[c - 1] + GAP_EXT;
        x[c] = opn > ext ? opn : ext;
        h[c] = x[c];
        y[c] = SCORE_MIN_SENTINEL;
    }
    for (int r = 1; r <= l2; r++) {
        int64_t row = cols * r, prev = row - cols;
        int32_t opn = h[prev] + GAP_OPN, ext = y[prev] + GAP_EXT;
        y[row] = opn > ext ? opn : ext;
        h[row] = y[row];
        x[row] = SCORE_MIN_SENTINEL;
        const int *sub = SUB[s2[r - 1]];
        for (int c = 1; c <= l1; c++) {
            int32_t diag = h[prev + c - 1] + sub[s1[c - 1]];
            int32_t ox = h[row + c - 1] + GAP_OPN;
            int32_t ex = x[row + c - 1] + GAP_EXT;
            int32_t oy = h[prev + c] + GAP_OPN;
            int32_t ey = y[prev + c] + GAP_EXT;
            int32_t xc = ox > ex ? ox : ex;
            int32_t yc = oy > ey ? oy : ey;
            x[row + c] = xc;
            y[row + c] = yc;
            int32_t best = diag > xc ? diag : xc;
            best = best > yc ? best : yc;
            h[row + c] = best;
        }
    }
    return h[cols * l2 + l1];
}

int main(void) {
    for (int i = 0; i < N_SEQS; i++) {
        lens[i] = LEN_LO + (int)(rng_next() % (LEN_HI - LEN_LO + 1));
        seqs[i] = malloc(lens[i]);
        for (int k = 0; k < lens[i]; k++)
            seqs[i][k] = (int8_t)(rng_next() % 20);
    }

    int64_t npairs = (int64_t)N_SEQS * (N_SEQS - 1) / 2;
    int64_t cells = 0;
    for (int j = 1; j < N_SEQS; j++)
        for (int i = 0; i < j; i++)
            cells += (int64_t)lens[i] * lens[j];

    size_t tbl = (size_t)(LEN_HI + 1) * (LEN_HI + 1);
    volatile int64_t sink = 0;

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
#pragma omp parallel reduction(+ : sink)
    {
        int32_t *h = malloc(tbl * sizeof(int32_t));
        int32_t *x = malloc(tbl * sizeof(int32_t));
        int32_t *y = malloc(tbl * sizeof(int32_t));
#pragma omp for schedule(dynamic)
        for (int j = 1; j < N_SEQS; j++)
            for (int i = 0; i < j; i++)
                sink += ga_affine(seqs[j], lens[j], seqs[i], lens[i], h, x, y);
        free(h); free(x); free(y);
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);

    double dt = (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) * 1e-9;
    int threads = 1;
#ifdef _OPENMP
    threads = omp_get_max_threads();
#endif
    fprintf(stderr, "threads=%d pairs=%lld cells=%lld time=%.3fs checksum=%lld\n",
            threads, (long long)npairs, (long long)cells, dt, (long long)sink);
    printf("{\"gcups\": %.4f, \"pairs_per_sec\": %.1f}\n", cells / dt / 1e9,
           npairs / dt);
    return 0;
}
