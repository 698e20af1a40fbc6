#include <stdio.h>
#include <stdlib.h>
#include "ckks_common.h"
#include "ntt.h"
#include "parameters.h"
#include "util_print.h"
int main(void)
{
    size_t n = 4096, nprimes = 1;
    Parms parms;
    parms.sample_s = true; parms.is_asymmetric = false; parms.small_s = true;
    uint16_t *im = calloc(n, sizeof(uint16_t));
    ckks_setup(n, nprimes, im, &parms);
    int64_t *cvi = calloc(n, sizeof(int64_t));
    // same pte values as sym_probe: base (i%100)-50 plus error — instead just test raw patterns incl. negatives
    for (size_t i = 0; i < n; i++) cvi[i] = (int64_t)(i % 100) - 50 + ((i % 7 == 0) ? -13 : 5);
    print_poly_int64_full("pte", cvi, n);
    ZZ *red = calloc(n, sizeof(ZZ));
    reduce_set_pte(&parms, cvi, red);
    print_poly_full("red", red, n);
    ZZ *roots = calloc(4 * n, sizeof(ZZ));
    ntt_roots_initialize(&parms, roots);
    ntt_inpl(&parms, roots, red);
    print_poly_full("ntt_red", red, n);
    return 0;
}
