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
    size_t n = 4096, nprimes = 1;
    Parms parms;
    parms.sample_s = true; parms.is_asymmetric = false; parms.small_s = true;
    uint16_t *im = calloc(n, sizeof(uint16_t));
    ckks_setup(n, nprimes, im, &parms);
    uint8_t sk_seed[64], share_seed[64], err_seed[64];
    for (size_t i = 0; i < 64; i++) { sk_seed[i] = 1 + i; share_seed[i] = 2 + i; err_seed[i] = 3 + i; }
    SE_PRNG prng, shareable_prng;
    ZZ *s = calloc(n, sizeof(ZZ));
    ckks_setup_s(&parms, sk_seed, &prng, s);
    int64_t *conj_vals_int = calloc(n, sizeof(int64_t));
    for (size_t i = 0; i < n; i++) conj_vals_int[i] = (int64_t)(i % 100) - 50;
    ckks_sym_init(&parms, share_seed, err_seed, &shareable_prng, &prng, conj_vals_int);
    print_poly_int64_full("pte", conj_vals_int, n);
    ZZ *c0 = calloc(n, sizeof(ZZ)); ZZ *c1 = calloc(n, sizeof(ZZ));
    ZZ *ntt_pte = calloc(n, sizeof(ZZ)); ZZ *roots = calloc(4*n, sizeof(ZZ));
    ZZ *c1s = calloc(n, sizeof(ZZ)); ZZ *ssave = calloc(n, sizeof(ZZ));
    ckks_encode_encrypt_sym(&parms, conj_vals_int, NULL, &shareable_prng, s, ntt_pte, roots, c0, c1, ssave, c1s);
    print_poly_full("c0", c0, n);
    print_poly_full("c1", c1s, n);
    print_poly_full("ntt_s", ssave, n);
    print_poly_full("ntt_pte_buf", ntt_pte, n);
    return 0;
}
