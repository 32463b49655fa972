/* Walker/Vose alias-table construction for envmap texel sampling.
 *
 * The renderer importance-samples environment maps by texel.  The CDF
 * route needs two per-lane binary searches (~24 serialized gathers per
 * draw on a TPU); an alias table needs TWO gathers (prob[j], alias[j]).
 * Building the table is a strict O(n) sequential pairing loop, so it
 * lives here in C (an 8k x 4k envmap is 33M texels; the Python-loop
 * oracle in mcpt_tpu/models/emitter.py covers small inputs and tests).
 *
 * Reference for the sampling semantics being replaced:
 * csrt src/renderer/emitters/envmap.cpp:20-68 (row/column CDF build)
 * and envmap.cpp:70-98 (two binary searches per draw).
 *
 * Algorithm: Vose 1991, "A linear algorithm for generating random
 * numbers with a given distribution".
 */

#include <stdint.h>
#include <stdlib.h>

/* weights: [n] non-negative (unnormalized); prob/alias: [n] outputs.
 * scratch: caller-provided [2*n] int32 workspace (small/large stacks).
 * Returns 0 on success, -1 if every weight is zero. */
int alias_build(const double *weights, int64_t n, float *prob,
                int32_t *alias, int32_t *scratch, double *scaled) {
    double total = 0.0;
    for (int64_t i = 0; i < n; i++) total += weights[i];
    if (!(total > 0.0)) return -1;
    const double scale = (double)n / total;

    int32_t *small = scratch;
    int32_t *large = scratch + n;
    int64_t ns = 0, nl = 0;
    for (int64_t i = 0; i < n; i++) {
        scaled[i] = weights[i] * scale;
        if (scaled[i] < 1.0) small[ns++] = (int32_t)i;
        else                 large[nl++] = (int32_t)i;
        prob[i] = 1.0f;           /* default: always pick own column */
        alias[i] = (int32_t)i;
    }
    while (ns > 0 && nl > 0) {
        int32_t s = small[--ns];
        int32_t l = large[--nl];
        prob[s] = (float)scaled[s];
        alias[s] = l;
        scaled[l] -= (1.0 - scaled[s]);
        if (scaled[l] < 1.0) small[ns++] = l;
        else                 large[nl++] = l;
    }
    /* leftovers (fp residue): probability 1, self alias — already set */
    while (ns > 0) { int32_t s = small[--ns]; prob[s] = 1.0f; alias[s] = s; }
    while (nl > 0) { int32_t l = large[--nl]; prob[l] = 1.0f; alias[l] = l; }
    return 0;
}
