#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "ckks_common.h"
#include "ckks_sym.h"
#include "ntt.h"
#include "parameters.h"
#include "sample.h"
#include "util_print.h"
int main(void)
{
    size_t n = 4096, nprimes = 3;
    Parms parms;
    parms.sample_s = true; parms.is_asymmetric = false; parms.small_s = true;
    uint16_t *im = calloc(n, sizeof(uint16_t));
    ckks_setup(n, nprimes, im, &parms);
    uint8_t sk_seed[SE_PRNG_SEED_BYTE_COUNT];
    for (size_t i = 0; i < SE_PRNG_SEED_BYTE_COUNT; i++) sk_seed[i] = (uint8_t)(1 + i);
    SE_PRNG prng;
    ZZ *s = calloc(n, sizeof(ZZ));
    ckks_setup_s(&parms, sk_seed, &prng, s);
    print_poly_uint8_full("sk_packed", (uint8_t *)s, n / 4);
    ZZ *se = calloc(n, sizeof(ZZ));
    expand_poly_ternary(s, &parms, se);
    print_poly_full("s_expanded", se, n);
    ZZ *roots = calloc(4 * n, sizeof(ZZ));
    ntt_roots_initialize(&parms, roots);
    ntt_inpl(&parms, roots, se);
    print_poly_full("ntt_s", se, n);
    return 0;
}
