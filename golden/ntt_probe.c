#include <stdio.h>
#include <stdlib.h>
#include "ckks_common.h"
#include "ntt.h"
#include "parameters.h"
#include "util_print.h"
int main(void)
{
    size_t n = 4096, nprimes = 3;
    Parms parms;
    parms.sample_s = true; parms.is_asymmetric = false; parms.small_s = true;
    uint16_t *im = calloc(n, sizeof(uint16_t));
    ckks_setup(n, nprimes, im, &parms);
    ZZ *vec = calloc(n, sizeof(ZZ));
    ZZ *roots = calloc(4 * n, sizeof(ZZ));
    for (size_t i = 0; i < n; i++) vec[i] = (ZZ)((i * 2654435761u + 12345u) % parms.curr_modulus->value);
    print_poly_full("in", vec, n);
    ntt_roots_initialize(&parms, roots);
    ntt_inpl(&parms, roots, vec);
    print_poly_full("out", vec, n);
    return 0;
}
