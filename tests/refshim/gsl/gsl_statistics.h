/* Minimal header-only stand-in for gsl_stats_correlation, sufficient to build
 * the reference ngsLD binary as a *test oracle* on systems without libgsl.
 *
 * Uses the standard numerically stable one-pass (Welford-style) update with
 * long double accumulators, the same well-known textbook recurrence GSL
 * documents for this function, so that printed values agree to far more than
 * the 6 decimal places the reference emits.
 *
 * This file is original code written for the ngsLD-TPU test harness.
 */
#pragma once

#include <stddef.h>
#include <math.h>

#ifdef __cplusplus
extern "C" {
#endif

static inline double gsl_stats_correlation(const double data1[], const size_t stride1,
                                           const double data2[], const size_t stride2,
                                           const size_t n) {
  size_t i;
  long double sum_xsq = 0.0;
  long double sum_ysq = 0.0;
  long double sum_cross = 0.0;
  long double ratio;
  long double delta_x, delta_y;
  long double mean_x, mean_y;
  long double r;

  mean_x = data1[0 * stride1];
  mean_y = data2[0 * stride2];

  for (i = 1; i < n; ++i) {
    ratio = i / (i + 1.0);
    delta_x = data1[i * stride1] - mean_x;
    delta_y = data2[i * stride2] - mean_y;
    sum_xsq += delta_x * delta_x * ratio;
    sum_ysq += delta_y * delta_y * ratio;
    sum_cross += delta_x * delta_y * ratio;
    mean_x += delta_x / (i + 1.0);
    mean_y += delta_y / (i + 1.0);
  }

  r = sum_cross / (sqrt((double)sum_xsq) * sqrt((double)sum_ysq));
  return (double)r;
}

#ifdef __cplusplus
}
#endif
