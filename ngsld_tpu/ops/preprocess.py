"""Jittable preprocessing ops (JAX engine).

Device-side equivalents of the reference's per-site host loops:
  * normalize_gl   — log-softmax normalization (gen_func.cpp:920-932)
  * call_geno      — genotype calling w/ thresholds (gen_func.cpp:886-914)
  * est_maf        — per-site MAF (gen_func.cpp:974-1009; with the NULL prior
                     the reference's EM is the closed form mean(E[G])/2)
  * expected_geno  — E[G] = p1 + 2*p2 (ngsLD.cpp:107-114)

All ops take gl as (n_sites, n_ind, 3); log-space in, as read_geno returns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import EPSILON, INF, N_GENO


def normalize_gl(gl_log: jnp.ndarray) -> jnp.ndarray:
    """Log-softmax over the genotype axis (stable max-shift, like logsum)."""
    m = jnp.max(gl_log, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # all -inf rows stay -inf
    norm = jnp.log(jnp.sum(jnp.exp(gl_log - m), axis=-1, keepdims=True)) + m
    return gl_log - norm


def miss_mask(gl: jnp.ndarray) -> jnp.ndarray:
    """miss_data (gen_func.cpp:862-868): |g0-g1|<eps and |g1-g2|<eps."""
    return (jnp.abs(gl[..., 0] - gl[..., 1]) < EPSILON) & \
           (jnp.abs(gl[..., 1] - gl[..., 2]) < EPSILON)


def call_geno(gl_log: jnp.ndarray, N_thresh: float, call_thresh: float) -> jnp.ndarray:
    """Vectorized call_geno, miss-mode 0 (gen_func.cpp:886-914).

    First-max/first-min tie-breaking matches array_max_pos/array_min_pos
    (strict > / < comparisons keep the first extreme, gen_func.cpp:73-98).
    """
    # first argmax: argmax returns first occurrence in jnp as in numpy
    max_pos = jnp.argmax(gl_log, axis=-1)
    mx = jnp.take_along_axis(gl_log, max_pos[..., None], axis=-1)[..., 0]
    mn = jnp.min(gl_log, axis=-1)
    max_pp = jnp.exp(mx)
    missing = mn == mx  # min==max => all equal => missing sentinel
    max_pp = jnp.where(missing, -1.0, max_pp)

    log_third = jnp.log(jnp.asarray(1.0 / N_GENO, gl_log.dtype))
    out = jnp.where((max_pp < N_thresh)[..., None], log_third, gl_log)
    onehot = jnp.where(
        (jax.nn.one_hot(max_pos, N_GENO, dtype=jnp.bool_)),
        0.0, jnp.asarray(-1e15, gl_log.dtype))
    out = jnp.where((max_pp >= call_thresh)[..., None], onehot, out)
    return out


def est_maf(gl_log: jnp.ndarray, ignore_miss_data: bool) -> jnp.ndarray:
    """Closed-form MAF with a NULL prior: sum(pp1 + 2*pp2) / (2 * n_used).

    The reference EM's accumulators converge to exactly this ratio in <=2
    passes (gen_func.cpp:976-1005; see strict.est_maf_all for the bit-exact
    double-pass). n_used excludes missing individuals only when
    --ignore_miss_data; an all-excluded site yields NaN as in the reference.
    """
    pp = jnp.exp(normalize_gl(gl_log))
    include = (~miss_mask(gl_log)) if ignore_miss_data else jnp.ones(gl_log.shape[:2], bool)
    num = jnp.sum(jnp.where(include, pp[..., 1] + 2.0 * pp[..., 2], 0.0), axis=1)
    den = 2.0 * jnp.sum(include, axis=1).astype(gl_log.dtype)
    return num / den


def expected_geno(gl_normal: jnp.ndarray) -> jnp.ndarray:
    """E[G] per site/ind from normal-space GLs (ngsLD.cpp:113)."""
    return gl_normal[..., 1] + 2.0 * gl_normal[..., 2]


def preprocess(gl_log: jnp.ndarray, call: bool, N_thresh: float, call_thresh: float,
               ignore_miss_data: bool, raw: bool = False, in_log: bool = True):
    """Full preprocessing pass: (optionally) call genotypes, MAF, normal-space
    GLs, expected genotypes. Mirrors ngsLD.cpp:92-114.

    `call`, `ignore_miss_data`, `raw`, `in_log` are trace-time constants; jit
    at the call site with static_argnums for them.

    raw=True accepts UNNORMALIZED binary-file records (the engine's streamed
    fast path skips the host normalize pass) and applies the binary reader's
    semantics on device: optional log-convert with the -INF clamp
    (read_data.cpp:38, gen_func.cpp:125-132), then post_prob
    (read_data.cpp:42). NaN inputs are rejected host-side by the loader.
    """
    if raw:
        if not in_log:
            lg = jnp.log(gl_log)
            gl_log = jnp.where(jnp.isinf(lg) & (lg < 0),
                               jnp.asarray(-INF, lg.dtype), lg)
        gl_log = normalize_gl(gl_log)
    if call:
        gl_log = call_geno(gl_log, N_thresh, call_thresh)
    maf = est_maf(gl_log, ignore_miss_data)
    gn = jnp.exp(gl_log)
    eg = expected_geno(gn)
    return gn, maf, eg
