/* Monotonic DTW for cross-attention word-timestamp alignment.
 *
 * Hot host-side kernel of the streaming loop: every transcription window runs
 * DTW over (n_tokens × n_frames) ≈ 100 × 1500 — a pure-Python DP costs
 * 50–100 ms per window, this C version ~0.1 ms. Built by native/build.py into
 * librtwa_native.so and loaded via ctypes (timestamps.py); the Python DP
 * remains as a fallback and as the parity oracle in tests.
 *
 * Contract (matches timestamps.dtw_path): cost is row-major (n × m) float64;
 * outputs are the backtraced path (token_idx, frame_idx), length ≤ n + m,
 * written front-to-back; returns the path length.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

int64_t rtwa_dtw(const double *cost, int64_t n, int64_t m,
                 int32_t *out_ti, int32_t *out_fj) {
    if (n <= 0 || m <= 0) return 0;
    const double INF = 1e300;
    /* acc has (n+1) x (m+1), trace packed 2 bits -> bytes for simplicity */
    double *prev = (double *)malloc((size_t)(m + 1) * sizeof(double));
    double *cur = (double *)malloc((size_t)(m + 1) * sizeof(double));
    unsigned char *trace = (unsigned char *)malloc((size_t)n * (size_t)m);
    if (!prev || !cur || !trace) { free(prev); free(cur); free(trace); return -1; }

    prev[0] = 0.0;
    for (int64_t j = 1; j <= m; j++) prev[j] = INF;

    for (int64_t i = 1; i <= n; i++) {
        const double *row = cost + (i - 1) * m;
        unsigned char *trow = trace + (i - 1) * m;
        cur[0] = INF;
        for (int64_t j = 1; j <= m; j++) {
            double c0 = prev[j - 1]; /* diagonal */
            double c1 = prev[j];     /* token advance */
            double c2 = cur[j - 1];  /* frame advance */
            double best;
            unsigned char t;
            if (c0 <= c1 && c0 <= c2) { best = c0; t = 0; }
            else if (c1 <= c2)        { best = c1; t = 1; }
            else                      { best = c2; t = 2; }
            cur[j] = best + row[j - 1];
            trow[j - 1] = t;
        }
        double *tmp = prev; prev = cur; cur = tmp;
    }

    /* backtrace */
    int64_t i = n, j = m, k = 0;
    int64_t cap = n + m;
    while (i > 0 && j > 0 && k < cap) {
        out_ti[k] = (int32_t)(i - 1);
        out_fj[k] = (int32_t)(j - 1);
        unsigned char t = trace[(i - 1) * m + (j - 1)];
        k++;
        if (t == 0) { i--; j--; }
        else if (t == 1) { i--; }
        else { j--; }
    }
    /* reverse in place */
    for (int64_t a = 0, b = k - 1; a < b; a++, b--) {
        int32_t tt = out_ti[a]; out_ti[a] = out_ti[b]; out_ti[b] = tt;
        int32_t tf = out_fj[a]; out_fj[a] = out_fj[b]; out_fj[b] = tf;
    }
    free(prev); free(cur); free(trace);
    return k;
}

/* Median filter (odd width, edge-padded) over rows of an (n × m) matrix —
 * the other per-window host DSP in the timestamp path. */
static int cmp_double(const void *a, const void *b) {
    double x = *(const double *)a, y = *(const double *)b;
    return (x > y) - (x < y);
}

void rtwa_median_filter(const double *x, int64_t n, int64_t m, int64_t width,
                        double *out) {
    int64_t half = width / 2;
    double *win = (double *)malloc((size_t)width * sizeof(double));
    if (!win) return;
    for (int64_t i = 0; i < n; i++) {
        const double *row = x + i * m;
        double *orow = out + i * m;
        for (int64_t j = 0; j < m; j++) {
            for (int64_t k = 0; k < width; k++) {
                int64_t idx = j - half + k;
                if (idx < 0) idx = 0;
                if (idx >= m) idx = m - 1;
                win[k] = row[idx];
            }
            qsort(win, (size_t)width, sizeof(double), cmp_double);
            orow[j] = win[width / 2];
        }
    }
    free(win);
}
