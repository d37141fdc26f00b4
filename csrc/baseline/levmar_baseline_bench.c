/* Reference-baseline microbench: the app's exact call profile
   (dlevmar_bc_dif, m=3, n=16, itmax=100, p0={0.5,1,1}, box [0,100]^3,
   opts from brdfdata.cpp:1107-1117), blinn-phong residual. */
#include <stdio.h>
#include <stdlib.h>
#include <math.h>
#include <time.h>
#include "levmar.h"

typedef struct { double *angles; int n; } Data;

static void brdf_func(double *p, double *x, int m, int n, void *adata) {
    Data *d = (Data *)adata;
    for (int i = 0; i < n; i++) {
        double cphi = d->angles[i];
        double cth = d->angles[n + i];
        x[i] = p[0] * cphi + p[1] * pow(cth, p[2]);
    }
}

int main(int argc, char **argv) {
    int fits = argc > 1 ? atoi(argv[1]) : 20000;
    int n = 16;
    double lb[3] = {0, 0, 0}, ub[3] = {100, 100, 100};
    double opts[LM_OPTS_SZ] = {LM_INIT_MU, 1E-15, 1E-15, 1E-20, LM_DIFF_DELTA};
    double info[LM_INFO_SZ];
    srand(42);
    double *angles = malloc(sizeof(double) * 2 * n * fits);
    double *targets = malloc(sizeof(double) * n * fits);
    for (int f = 0; f < fits; f++) {
        double kd = 0.1 + 0.8 * rand() / (double)RAND_MAX;
        double ks = 0.2 + 0.8 * rand() / (double)RAND_MAX;
        double sh = 2.0 + 28.0 * rand() / (double)RAND_MAX;
        for (int i = 0; i < n; i++) {
            double cphi = rand() / (double)RAND_MAX;
            double cth = rand() / (double)RAND_MAX;
            angles[f * 2 * n + i] = cphi;
            angles[f * 2 * n + n + i] = cth;
            targets[f * n + i] = kd * cphi + ks * pow(cth, sh);
        }
    }
    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    double checksum = 0; long total_iters = 0;
    for (int f = 0; f < fits; f++) {
        double p[3] = {0.5, 1.0, 1.0};
        Data d = {angles + f * 2 * n, n};
        dlevmar_bc_dif(brdf_func, p, targets + f * n, 3, n, lb, ub, NULL,
                       100, opts, info, NULL, NULL, &d);
        checksum += p[0]; total_iters += (long)info[5];
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    double secs = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
    printf("{\"fits\": %d, \"secs\": %.3f, \"fits_per_sec\": %.1f, \"mean_iters\": %.1f, \"checksum\": %.3f}\n",
           fits, secs, fits / secs, total_iters / (double)fits, checksum);
    return 0;
}
