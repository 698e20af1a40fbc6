#include <stdio.h>
#include <stdlib.h>
#include "ckks_common.h"
#include "ntt.h"
#include "parameters.h"
#include "uintmodarith.h"
#include "util_print.h"
int main(void)
{
    size_t n = 4096, nprimes = 1;
    Parms parms;
    parms.sample_s = true; parms.is_asymmetric = false; parms.small_s = true;
    uint16_t *im = calloc(n, sizeof(uint16_t));
    ckks_setup(n, nprimes, im, &parms);
    Modulus *mod = parms.curr_modulus;
    // mul_mod edge cases
    ZZ tests[][2] = {{1053818880, 1053818880}, {1053818880, 503422}, {4294967295u, 4294967295u},
                     {2107637760u, 1053818880}, {123456789, 987654321}, {1053818881, 1053818881},
                     {4000000000u, 3000000000u}, {1, 1053818880}};
    for (size_t i = 0; i < sizeof(tests)/sizeof(tests[0]); i++)
    {
        ZZ r = mul_mod(tests[i][0], tests[i][1], mod);
        printf("mul_mod %u %u = %u\n", tests[i][0], tests[i][1], r);
    }
    // one-shot root table
    ZZ *roots = calloc(4 * n, sizeof(ZZ));
    ntt_roots_initialize(&parms, roots);
    print_poly_full("roots", roots, n);
    return 0;
}
