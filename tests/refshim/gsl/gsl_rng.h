/* Minimal header-only stand-in for the GSL RNG API, sufficient to build the
 * reference ngsLD binary as a *test oracle* on systems without libgsl.
 *
 * Implements the classic "taus" (Tausworthe, L'Ecuyer 1996) generator using
 * the same published recurrence and seeding procedure that GSL documents for
 * its gsl_rng_taus generator, so that seeded runs are reproducible.
 *
 * This file is original code written for the ngsLD-TPU test harness.
 */
#pragma once

#include <stdlib.h>

typedef struct {
  unsigned long int s1, s2, s3;
} gsl_rng;

typedef struct {
  const char *name;
} gsl_rng_type;

static const gsl_rng_type gsl_rng_taus_type = {"taus"};
static const gsl_rng_type *gsl_rng_taus = &gsl_rng_taus_type;

static inline unsigned long int gsl_rng_shim_get(gsl_rng *r) {
#define GSL_SHIM_MASK 0xffffffffUL
#define GSL_SHIM_TAUS(s, a, b, c, d) \
  (((((s) & (c)) << (d)) & GSL_SHIM_MASK) ^ (((((s) << (a)) & GSL_SHIM_MASK) ^ (s)) >> (b)))
  r->s1 = GSL_SHIM_TAUS(r->s1, 13, 19, 4294967294UL, 12);
  r->s2 = GSL_SHIM_TAUS(r->s2, 2, 25, 4294967288UL, 4);
  r->s3 = GSL_SHIM_TAUS(r->s3, 3, 11, 4294967280UL, 17);
  return (r->s1 ^ r->s2 ^ r->s3);
#undef GSL_SHIM_TAUS
}

static inline void gsl_rng_set(gsl_rng *r, unsigned long int s) {
  if (s == 0)
    s = 1; /* default seed is 1; zero-test happens before any masking */
#define GSL_SHIM_LCG(n) ((69069UL * (n)) & 0xffffffffUL)
  r->s1 = GSL_SHIM_LCG(s);
  if (r->s1 < 2) r->s1 += 2UL;
  r->s2 = GSL_SHIM_LCG(r->s1);
  if (r->s2 < 8) r->s2 += 8UL;
  r->s3 = GSL_SHIM_LCG(r->s2);
  if (r->s3 < 16) r->s3 += 16UL;
#undef GSL_SHIM_LCG
  /* warm up */
  for (int i = 0; i < 6; i++)
    gsl_rng_shim_get(r);
}

static inline gsl_rng *gsl_rng_alloc(const gsl_rng_type *T) {
  (void)T;
  gsl_rng *r = (gsl_rng *)malloc(sizeof(gsl_rng));
  gsl_rng_set(r, 0);
  return r;
}

static inline void gsl_rng_free(gsl_rng *r) { free(r); }

/* Uniform in [0, 1) with 32-bit resolution, matching taus' get_double. */
static inline double gsl_rng_uniform(gsl_rng *r) {
  return gsl_rng_shim_get(r) / 4294967296.0;
}
