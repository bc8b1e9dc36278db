"""LD statistics from EM haplotype frequencies + Pearson r² of E[G].

Device-side equivalents of ngsLD.cpp:289-333 and 365-367.
"""

from __future__ import annotations

import jax.numpy as jnp


def _c_min(a, b):
    """C macro min(a,b) = (a<=b ? a : b), incl. its NaN asymmetry
    (gen_func.hpp:22)."""
    return jnp.where(a <= b, a, b)


def ld_stats(f: jnp.ndarray):
    """maf_hat1, maf_hat2, D, D', r2 from hap freqs (ngsLD.cpp:296-306)."""
    maf0 = 1 - (f[:, 0] + f[:, 1])
    maf1 = 1 - (f[:, 0] + f[:, 2])
    D = f[:, 0] * f[:, 3] - f[:, 1] * f[:, 2]
    neg = -_c_min(maf0 * maf1, (1 - maf0) * (1 - maf1))
    pos = _c_min(maf0 * (1 - maf1), (1 - maf0) * maf1)
    Dp = D / jnp.where(D < 0, neg, pos)
    rr = D / jnp.sqrt(maf0 * maf1 * (1 - maf0) * (1 - maf1))
    return maf0, maf1, D, Dp, rr * rr


def chi2_stat(f: jnp.ndarray):
    """1-df association chi² in float32, as the reference computes it
    (ngsLD.cpp:328-333: float accumulator, double terms)."""
    f32 = jnp.float32
    freq_A = (f[:, 0] + f[:, 1]).astype(f32)
    freq_B = (f[:, 0] + f[:, 2]).astype(f32)
    exp_hap = jnp.stack([freq_A * freq_B, freq_A * (1 - freq_B),
                         (1 - freq_A) * freq_B, (1 - freq_A) * (1 - freq_B)],
                        axis=1)
    diff = f - exp_hap.astype(f.dtype)
    terms = (diff * diff) / exp_hap.astype(f.dtype)
    chi2 = jnp.zeros(f.shape[0], f32)
    for i in range(4):  # sequential float32 rounding, like the reference
        chi2 = (chi2.astype(f.dtype) + terms[:, i]).astype(f32)
    return chi2


def pearson_r2(x: jnp.ndarray, y: jnp.ndarray):
    """Squared Pearson correlation over individuals (ngsLD.cpp:365-367).

    Two-pass mean-centered formulation; the reference's GSL one-pass long
    double version agrees to well past the printed 6 decimals. x,y: (P, I).
    """
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    yc = y - jnp.mean(y, axis=1, keepdims=True)
    num = jnp.sum(xc * yc, axis=1)
    den = jnp.sqrt(jnp.sum(xc * xc, axis=1)) * jnp.sqrt(jnp.sum(yc * yc, axis=1))
    r = num / den
    return r * r
