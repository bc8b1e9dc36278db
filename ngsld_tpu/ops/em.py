"""Two-locus haplotype-frequency EM — the hot kernel, XLA formulation.

Device-side replacement for pair_freq_iter/haplo_freq
(/root/reference/shared/gen_func.cpp:1027-1119). The reference loops 4x4
haplotype-ordered pairs per individual; the two orderings (k,h)/(h,k) index
the same genotype cell, so its update reduces to

    D_k[i]   = sum_h f_h * P_i[G1(k,h), G2(k,h)]      (shifted 2x2 window)
    sum_i    = sum_k f_k * D_k[i]                      (EM denominator)
    f_k_new  = f_k * (1/x) * sum_i' D_k[i] / sum_i     (masked over used inds)

with P_i[g1,g2] = gl1[i,g1] * gl2[i,g2] never materialized: D_k contracts the
2x2 allele window directly against the (3,) GL vectors. Per individual per
iteration that is ~40 flops — VPU-friendly, no gathers, no data-dependent
shapes. Convergence handling matches the reference: per-pair freeze when
max_k |df_k| < EPSILON (NaN diffs ignored), hard cap ITER_MAX, per-pair
iteration counts returned (the `nIter` output column).

Shapes: gl1, gl2 (P, I, 3) normal-space GLs; all outputs (P, ...).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import EPSILON, ITER_MAX
from .preprocess import miss_mask

# (k -> site-1 allele bit, site-2 allele bit); k = 2*a1 + a2
_KBITS = [(0, 0), (0, 1), (1, 0), (1, 1)]


def _em_update(f, gl1, gl2, include, inv_x):
    """One EM step for all pairs. f: (P,4); gl1/gl2: (P,I,3);
    include: (P,I) float mask; inv_x: (P,) = 1/n_used."""
    # D_k[p,i] = sum_{a,b in {0,1}^2} f[p, 2a+b] * gl1[p,i,a1k+a] * gl2[p,i,a2k+b]
    D = []
    for (a1k, a2k) in _KBITS:
        d = None
        for (a, b) in _KBITS:
            t = f[:, 2 * a + b, None] * gl1[:, :, a1k + a] * gl2[:, :, a2k + b]
            d = t if d is None else d + t
        D.append(d)
    # denominator per individual
    s = None
    for k in range(4):
        t = f[:, k, None] * D[k]
        s = t if s is None else s + t
    r = include / s  # masked reciprocal; excluded inds contribute 0
    # S_k = sum_i D_k[i] / sum_i over included individuals
    f_new = jnp.stack([f[:, k] * jnp.sum(D[k] * r, axis=1) * inv_x
                       for k in range(4)], axis=1)
    f_new = f_new / jnp.sum(f_new, axis=1, keepdims=True)
    return f_new


def pair_em(gl1: jnp.ndarray, gl2: jnp.ndarray, maf1: jnp.ndarray,
            maf2: jnp.ndarray, ignore_miss_data: bool, live=None):
    """EM haplotype frequencies for P pairs.

    Returns (f (P,4), n_iter (P,) int32, n_used (P,) int32).

    live (P,) bool (optional): pairs the caller will actually EMIT. Dead
    pairs freeze at the f0 init with n_iter == ITER_MAX instead of
    iterating to their own (discarded) convergence — in a vectorized
    batch the LOOP runs to the slowest ACTIVE lane, and out-of-band
    rectangle lanes are routinely the slowest (garbage trajectories),
    so masking them shortens every banded tile batch (the ring
    steppers' rectangles; see parallel.ring._tile_mask)."""
    dt = gl1.dtype
    P = gl1.shape[0]
    f0 = jnp.stack([(1 - maf1) * (1 - maf2), (1 - maf1) * maf2,
                    maf1 * (1 - maf2), maf1 * maf2], axis=1).astype(dt)

    if ignore_miss_data:
        include = ~(miss_mask(gl1) | miss_mask(gl2))
    else:
        include = jnp.ones(gl1.shape[:2], bool)
    n_used = jnp.sum(include, axis=1).astype(jnp.int32)
    incf = include.astype(dt)
    # 1/x; x=0 pairs produce NaN updates which the NaN-ignoring eps fold
    # freezes at n_iter=0, matching the reference (see strict.pair_em_batch).
    inv_x = 1.0 / n_used.astype(dt)

    def cond(carry):
        it, f, active, n_iter = carry
        return (it < ITER_MAX) & jnp.any(active)

    def body(carry):
        it, f, active, n_iter = carry
        f_new = _em_update(f, gl1, gl2, incf, inv_x)
        f_next = jnp.where(active[:, None], f_new, f)
        diffs = jnp.abs(f_next - f)
        # NaN-ignoring max fold (matches `if (x > eps) eps = x`)
        eps = jnp.zeros(P, dt)
        for k in range(4):
            eps = jnp.where(diffs[:, k] > eps, diffs[:, k], eps)
        newly = active & (eps < EPSILON)
        n_iter = jnp.where(newly, it, n_iter)
        return it + 1, f_next, active & ~newly, n_iter

    act0 = jnp.ones(P, bool) if live is None else live
    carry = (jnp.int32(0), f0, act0,
             jnp.full(P, ITER_MAX, jnp.int32))
    _, f, _, n_iter = jax.lax.while_loop(cond, body, carry)
    return f, n_iter, n_used
