/* Hard-case driver for the reference's vendored levmar 2.6 box solver
   (dlevmar_bc_der, levmar/lmbc_core.c) — the cases where lmbc's
   accept/LNSRCH/projected-gradient trichotomy actually engages:

     1. start far OUTSIDE the box (projection + line search on entry)
     2. severely ill-scaled parameters, with and without dscl
     3. near-singular J^T J with the optimum at an active bound

   The recorded outputs (final p, ||e||^2, iterations, stop reason) are the
   golden constants in /root/repo/tests/test_lm_hard.py, which pits the JAX
   solver's freeze+damping replacement against them.

   Build (levmar is GPL and stays in the read-only reference tree):
     mkdir -p /tmp/levmar_bench && cd /tmp/levmar_bench
     cp /root/reference/levmar/*.c /root/reference/levmar/*.h .
     gcc -O3 -c lm.c Axb.c misc.c lmbc.c && ar rcs liblevmar.a *.o
     gcc -O3 /root/repo/csrc/baseline/lmbc_hard_cases.c -o hard -L. -llevmar -lm
     ./hard
*/
#include <stdio.h>
#include <math.h>
#include "levmar.h"

/* 1. Rosenbrock, box [-2,0.8]x[-2,2], start (100,-80) far outside. */
static void ros(double *p, double *x, int m, int n, void *a) {
    x[0] = 10.0 * (p[1] - p[0] * p[0]);
    x[1] = 1.0 - p[0];
}
static void jacros(double *p, double *j, int m, int n, void *a) {
    j[0] = -20.0 * p[0]; j[1] = 10.0;
    j[2] = -1.0;         j[3] = 0.0;
}

/* 2. Meyer's problem (classic ill-scaled NLS; lmdemo.c:138), boxed wide,
      started at levmar's standard x0. Exercises dscl. */
static const double meyer_y[16] = {
    34.780, 28.610, 23.650, 19.630, 16.370, 13.720, 11.540, 9.744,
    8.261, 7.030, 6.005, 5.147, 4.427, 3.820, 3.307, 2.872};
static void meyer(double *p, double *x, int m, int n, void *a) {
    for (int i = 0; i < n; ++i) {
        double ui = 0.45 + 0.05 * i;
        x[i] = p[0] * exp(10.0 * p[1] / (ui + p[2]) - 13.0) - meyer_y[i];
    }
}
static void jacmeyer(double *p, double *j, int m, int n, void *a) {
    for (int i = 0; i < n; ++i) {
        double ui = 0.45 + 0.05 * i;
        double tmp = exp(10.0 * p[1] / (ui + p[2]) - 13.0);
        j[i * 3]     = tmp;
        j[i * 3 + 1] = 10.0 * p[0] * tmp / (ui + p[2]);
        j[i * 3 + 2] = -10.0 * p[0] * p[1] * tmp / ((ui + p[2]) * (ui + p[2]));
    }
}

/* 3. Near-singular J^T J (cond ~ 1e8) with the optimum at an active upper
      bound: r = [p0 + p1 - 2, 1e-4 (p0 - p1)], box p0 <= 0.7. */
static void singb(double *p, double *x, int m, int n, void *a) {
    x[0] = p[0] + p[1] - 2.0;
    x[1] = 1e-4 * (p[0] - p[1]);
}
static void jacsingb(double *p, double *j, int m, int n, void *a) {
    j[0] = 1.0;  j[1] = 1.0;
    j[2] = 1e-4; j[3] = -1e-4;
}

static void run(const char *name,
                void (*f)(double *, double *, int, int, void *),
                void (*jf)(double *, double *, int, int, void *),
                double *p, int m, int n, double *lb, double *ub,
                double *dscl, int itmax) {
    double x[16] = {0};
    double info[LM_INFO_SZ];
    double opts[LM_OPTS_SZ] = {LM_INIT_MU, 1E-12, 1E-12, 1E-15, LM_DIFF_DELTA};
    int ret = dlevmar_bc_der(f, jf, p, x, m, n, lb, ub, dscl, itmax, opts,
                             info, NULL, NULL, NULL);
    printf("%s: ret=%d p=(", name, ret);
    for (int i = 0; i < m; ++i) printf("%.10g%s", p[i], i + 1 < m ? ", " : "");
    printf(") chi2=%.10g iters=%g stop=%g nfev=%g njev=%g nlss=%g\n",
           info[1], info[5], info[6], info[7], info[8], info[9]);
}

int main(void) {
    {
        double p[2] = {100.0, -80.0};
        double lb[2] = {-2.0, -2.0}, ub[2] = {0.8, 2.0};
        run("ros_far_outside", ros, jacros, p, 2, 2, lb, ub, NULL, 200);
    }
    {
        double p[3] = {8.85, 4.0, 25.0};   /* lmdemo's scaled start */
        double lb[3] = {1e-4, 1e-4, 1e-4}, ub[3] = {1e3, 1e3, 1e3};
        run("meyer_box_nodscl", meyer, jacmeyer, p, 3, 16, lb, ub, NULL, 1000);
    }
    {
        double p[3] = {8.85, 4.0, 25.0};
        double lb[3] = {1e-4, 1e-4, 1e-4}, ub[3] = {1e3, 1e3, 1e3};
        double dscl[3] = {0.01, 1.0, 10.0}; /* lmdemo.c's Meyer scaling */
        run("meyer_box_dscl", meyer, jacmeyer, p, 3, 16, lb, ub, dscl, 1000);
    }
    {
        double p[2] = {0.0, 0.0};
        double lb[2] = {0.0, 0.0}, ub[2] = {0.7, 2.0};
        run("singular_at_bound", singb, jacsingb, p, 2, 2, lb, ub, NULL, 200);
    }
    return 0;
}
