"""Pallas TPU kernel for the pair-EM hot loop.

Replaces the reference's per-pair scalar EM (gen_func.cpp:1076-1119) with a
lane-parallel kernel: pairs ride the 128-lane axis, individuals ride
sublanes, and the whole EM iterates in VMEM.

Why a kernel instead of the XLA while_loop in ops/em.py:
  * VMEM residency: the loop re-reads both sites' GL tiles every iteration;
    in XLA those live in HBM (the batch is far larger than VMEM), making the
    loop HBM-bound. Here each (I, PT) tile is loaded once and iterated on
    chip at register/VMEM speed.
  * Convergence granularity: the XLA batch iterates until the LAST pair of
    ~100k converges (worst case 100 iterations for everyone). The kernel
    tracks convergence per PT-pair tile, so easy tiles retire early.

Straggler compaction (pair_em_phased): iteration counts are heavy-tailed
(mean ~20, p99 ~100), so even per-tile early exit wastes ~3-4x work on the
tile max. The phased driver runs a capped phase 1 for all pairs, pulls the
(tiny) convergence metadata to the host, then re-runs only the unconverged
pairs — compacted, warm-started from their phase-1 state, and sorted by a
contraction-rate estimate of their remaining iterations so equally-hard
pairs share tiles. Measured ~4x reduction in executed tile-iterations on
realistic data (near the sorted-oracle bound). nIter semantics are exactly
preserved across the phase boundary.

Layout: gl tensors arrive as (3, I, P) f32 (P = lane axis, padded to the
tile), EM state f is (4, PT). All compute is VPU element-wise with sublane
reductions; there is no matmul shape here (the only contractions are the
2x2 allele window and the individual axis, both per-lane).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPSILON, ITER_MAX
from ..ops.preprocess import miss_mask

_KBITS = ((0, 0), (0, 1), (1, 0), (1, 1))

# The while body runs `unroll` exact steps between scalar convergence
# checks: a per-iteration `any(active)` forces a vector->scalar sync that
# otherwise dominates; converged pairs stay frozen inside the unrolled
# steps so the semantics (and nIter) are unchanged. Each loop's iteration
# cap must be a multiple of its unroll so it never runs past the budget.
_UNROLL = 4
assert ITER_MAX % _UNROLL == 0


def _em_kernel(g1_ref, g2_ref, f0_ref, incf_ref, invx_ref,
               f_out, niter_out, epsl_out, epsp_out, active_ref,
               *, iter_cap: int, unroll: int = _UNROLL):
    """One grid step = one (I, PT) pair tile, EM to convergence or cap.

    Outputs: f (4,PT), n_iter (1,PT; == iter_cap when unconverged), and the
    last two update magnitudes eps/eps_prev (for the phased driver's
    remaining-iteration estimate).
    """
    # Mosaic cannot carry sub-tile vectors through scf.while, so all EM
    # state lives in VMEM refs (the output blocks + an `active` scratch) and
    # the loop carries only scalars (iteration counter, all-done flag).
    for k in range(4):
        f_out[k:k + 1, :] = f0_ref[k:k + 1, :]
    niter_out[:] = jnp.full(niter_out.shape, iter_cap, jnp.int32)
    epsl_out[:] = jnp.ones(epsl_out.shape, jnp.float32)
    epsp_out[:] = jnp.ones(epsp_out.shape, jnp.float32)
    active_ref[:] = jnp.ones(active_ref.shape, jnp.float32)

    def cond(carry):
        it, done = carry
        return jnp.logical_and(it < iter_cap, jnp.logical_not(done))

    def em_step(it, fs, active, n_iter, eps_prev, eps_last):
        """One exact EM update with per-pair freeze bookkeeping (all vector
        ops, no scalar sync)."""
        incf = incf_ref[:]    # (I, PT)
        invx = invx_ref[:]    # (1, PT)
        # D_k[i,p] = sum_{a,b} f[2a+b] * g1[a1k+a] * g2[a2k+b], factorized
        # through Q[a][c] = f[2a]*g2[c] + f[2a+1]*g2[c+1] (24 ops vs 48).
        Q = [[fs[2 * a] * g2_ref[c] + fs[2 * a + 1] * g2_ref[c + 1]
              for c in range(2)] for a in range(2)]
        D = [g1_ref[a1k] * Q[0][a2k] + g1_ref[a1k + 1] * Q[1][a2k]
             for (a1k, a2k) in _KBITS]
        s = fs[0] * D[0]
        for k in range(1, 4):
            s = s + fs[k] * D[k]
        # masked reciprocal: approx + one Newton step gives ~2^-24 relative
        # error, ample for the EM's 1e-5 stop tolerance; full fp32 divides
        # are the single most expensive VPU op in this loop.
        r0 = pl.reciprocal(s, approx=True)
        r = incf * (r0 * (2.0 - s * r0))
        f_new = [fs[k] * jnp.sum(D[k] * r, axis=0, keepdims=True) * invx
                 for k in range(4)]
        norm = ((f_new[0] + f_new[1]) + f_new[2]) + f_new[3]
        rn0 = pl.reciprocal(norm, approx=True)
        rn = rn0 * (2.0 - norm * rn0)
        f_new = [fn * rn for fn in f_new]
        f_next = [jnp.where(active, f_new[k], fs[k]) for k in range(4)]
        eps = jnp.zeros(invx.shape, invx.dtype)
        for k in range(4):
            d = jnp.abs(f_next[k] - fs[k])
            eps = jnp.where(d > eps, d, eps)
        eps_prev = jnp.where(active, eps_last, eps_prev)
        eps_last = jnp.where(active, eps, eps_last)
        newly = jnp.logical_and(active, eps < EPSILON)
        still = jnp.logical_and(active, jnp.logical_not(newly))
        n_iter = jnp.where(newly, it, n_iter)
        return f_next, still, n_iter, eps_prev, eps_last

    def body(carry):
        it, _ = carry
        fs = [f_out[k:k + 1, :] for k in range(4)]
        active = active_ref[:] > 0.0
        n_iter = niter_out[:]
        eps_prev = epsp_out[:]
        eps_last = epsl_out[:]
        for u in range(unroll):
            fs, active, n_iter, eps_prev, eps_last = em_step(
                it + u, fs, active, n_iter, eps_prev, eps_last)
        for k in range(4):
            f_out[k:k + 1, :] = fs[k]
        niter_out[:] = n_iter
        epsp_out[:] = eps_prev
        epsl_out[:] = eps_last
        active_ref[:] = active.astype(jnp.float32)
        return it + unroll, jnp.logical_not(jnp.any(active))

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))


def _run_kernel(g1, g2, f0, incf, invx, *, pair_tile: int, iter_cap: int,
                interpret: bool, unroll: int = _UNROLL):
    """Invoke the EM kernel on pre-laid-out (3, Ip, Pp) tiles."""
    assert iter_cap % unroll == 0, (iter_cap, unroll)
    _, Ip, Pp = g1.shape
    PT = pair_tile
    grid = (Pp // PT,)
    spec3 = pl.BlockSpec((3, Ip, PT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    row = lambda h: pl.BlockSpec((h, PT), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_em_kernel, iter_cap=iter_cap, unroll=unroll),
        grid=grid,
        in_specs=[spec3, spec3, row(4), row(Ip), row(1)],
        out_specs=[row(4), row(1), row(1), row(1)],
        out_shape=[
            jax.ShapeDtypeStruct((4, Pp), jnp.float32),
            jax.ShapeDtypeStruct((1, Pp), jnp.int32),
            jax.ShapeDtypeStruct((1, Pp), jnp.float32),
            jax.ShapeDtypeStruct((1, Pp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, PT), jnp.float32)],
        interpret=interpret,
    )(g1, g2, f0, incf, invx)


def _layout(g, Ip, Pp, dt=jnp.float32):
    """(P, I, 3) -> padded (3, Ip, Pp)."""
    P, I, _ = g.shape
    g = g.astype(dt).transpose(2, 1, 0)
    return jnp.pad(g, ((0, 0), (0, Ip - I), (0, Pp - P)),
                   constant_values=1.0 / 3.0)


def _prep(gn1, gn2, maf1, maf2, ignore_miss_data, PT):
    """Common input prep: padded layouts, include mask, init freqs, 1/x."""
    P, I, _ = gn1.shape
    dt = jnp.float32
    Pp = -(-P // PT) * PT
    Ip = -(-I // 8) * 8
    if ignore_miss_data:
        include = ~(miss_mask(gn1) | miss_mask(gn2))
    else:
        include = jnp.ones((P, I), bool)
    n_used = jnp.sum(include, axis=1).astype(jnp.int32)
    g1 = _layout(gn1, Ip, Pp)
    g2 = _layout(gn2, Ip, Pp)
    incf = jnp.pad(include.astype(dt).T, ((0, Ip - I), (0, Pp - P)))
    # pad pairs get ONE live uniform-GL lane: all-zero inclusion makes
    # the update 0/0 -> nan and the pad lanes spin to iter_cap, gating
    # their whole tile; with one uniform lane the EM is a fixed point and
    # they converge at iteration 0 (survives any later pair permutation)
    incf = incf.at[0, P:].set(1.0)
    m1 = jnp.pad(maf1.astype(dt), (0, Pp - P), constant_values=0.5)
    m2 = jnp.pad(maf2.astype(dt), (0, Pp - P), constant_values=0.5)
    f0 = jnp.stack([(1 - m1) * (1 - m2), (1 - m1) * m2,
                    m1 * (1 - m2), m1 * m2], axis=0)   # (4, Pp)
    # x == 0 pairs (all-missing under ignore_miss_data): invx = inf, the
    # update goes NaN, and the NaN-ignoring eps fold freezes them at
    # n_iter = 0 with NaN frequencies — exactly the reference's behavior.
    invx = (1.0 / jnp.pad(n_used, (0, Pp - P), constant_values=1)
            .astype(dt))[None, :]
    return g1, g2, incf, f0, invx, n_used


def pick_pair_tile(n_ind: int) -> int | None:
    """Largest supported pair tile for a cohort of n_ind, or None when the
    (3, Ip, PT) input tiles cannot fit VMEM even at PT=128 (callers then
    use the XLA path ops.em.pair_em). Budget: two GL tiles + mask + state,
    double-buffered ~= 56*Ip*PT bytes against ~12 MB of scoped VMEM."""
    Ip = -(-n_ind // 8) * 8
    # empirical ceiling on v5e: Ip=1024/PT=128 (~7.3 MB by this formula)
    # compiles, Ip=1536/PT=128 (~11 MB) does not
    for pt in (256, 128):
        if 56 * Ip * pt <= 8_000_000:
            return pt
    return None


@functools.partial(jax.jit, static_argnames=("ignore_miss_data", "pair_tile",
                                             "interpret", "iter_cap"))
def pair_em_pallas(gn1: jnp.ndarray, gn2: jnp.ndarray, maf1: jnp.ndarray,
                   maf2: jnp.ndarray, ignore_miss_data: bool = False,
                   *, pair_tile: int = 256, interpret: bool = False,
                   iter_cap: int = ITER_MAX):
    """Drop-in for ops.em.pair_em: gl (P, I, 3) -> (f (P,4), n_iter, n_used).

    Pads P to the tile and I to the f32 sublane quantum; padded lanes run a
    trivially-converging dummy problem and are sliced off.
    """
    P = gn1.shape[0]
    g1, g2, incf, f0, invx, n_used = _prep(gn1, gn2, maf1, maf2,
                                           ignore_miss_data, pair_tile)
    f, n_iter, _, _ = _run_kernel(g1, g2, f0, incf, invx,
                                  pair_tile=pair_tile, iter_cap=iter_cap,
                                  interpret=interpret)
    return f[:, :P].T, n_iter[0, :P], n_used


# ------------------------------------------------------- phased driver ----

@functools.partial(jax.jit, static_argnames=("ignore_miss_data", "pair_tile",
                                             "interpret", "cap"))
def _phase1(gn1, gn2, maf1, maf2, ignore_miss_data, pair_tile, interpret, cap):
    P = gn1.shape[0]
    g1, g2, incf, f0, invx, n_used = _prep(gn1, gn2, maf1, maf2,
                                           ignore_miss_data, pair_tile)
    f, n_iter, epsl, epsp = _run_kernel(g1, g2, f0, incf, invx,
                                        pair_tile=pair_tile, iter_cap=cap,
                                        interpret=interpret)
    meta = jnp.stack([n_iter[0, :P].astype(jnp.float32),
                      epsl[0, :P], epsp[0, :P]], axis=1)
    return f[:, :P].T, n_used, meta


@functools.partial(jax.jit, static_argnames=("ignore_miss_data", "pair_tile",
                                             "interpret", "cap"))
def _phase2(gn1, gn2, f_warm, idx, ignore_miss_data, pair_tile, interpret, cap):
    """Re-run the unconverged subset: gathered, warm-started."""
    g1s = jnp.take(gn1, idx, axis=0)
    g2s = jnp.take(gn2, idx, axis=0)
    P = g1s.shape[0]
    PT = pair_tile
    Pp = -(-P // PT) * PT
    Ip = -(-g1s.shape[1] // 8) * 8
    if ignore_miss_data:
        include = ~(miss_mask(g1s) | miss_mask(g2s))
    else:
        include = jnp.ones(g1s.shape[:2], bool)
    n_used = jnp.sum(include, axis=1).astype(jnp.int32)
    g1 = _layout(g1s, Ip, Pp)
    g2 = _layout(g2s, Ip, Pp)
    incf = jnp.pad(include.astype(jnp.float32).T, ((0, Ip - g1s.shape[1]),
                                                   (0, Pp - P)))
    incf = incf.at[0, P:].set(1.0)   # pad pairs: one live uniform lane
    f0 = jnp.pad(jnp.take(f_warm, idx, axis=0).T.astype(jnp.float32),
                 ((0, 0), (0, Pp - P)), constant_values=0.25)
    invx = (1.0 / jnp.pad(n_used, (0, Pp - P), constant_values=1)
            .astype(jnp.float32))[None, :]
    f, n_iter, _, _ = _run_kernel(g1, g2, f0, incf, invx, pair_tile=PT,
                                  iter_cap=cap, interpret=interpret)
    return f[:, :P].T, n_iter[0, :P]


def pair_em_phased(gn1, gn2, maf1, maf2, ignore_miss_data: bool = False,
                   *, cap1: int = 16, pair_tile: int = 256,
                   interpret: bool = False, bucket: int = 2048):
    """Host-orchestrated two-phase EM with exact compaction.

    Returns HOST numpy (f (P,4), n_iter (P,), n_used (P,)). Identical
    results to pair_em_pallas(iter_cap=ITER_MAX), faster on heavy-tailed
    iteration distributions. `bucket` bounds phase-2 recompiles by padding
    the compacted pair count to a multiple.
    """
    P = gn1.shape[0]
    f1_d, n_used_d, meta_d = _phase1(gn1, gn2, maf1, maf2, ignore_miss_data,
                                     pair_tile, interpret, cap1)
    meta = np.asarray(meta_d)  # one small transfer: (P, 3)
    n_iter = meta[:, 0].astype(np.int32)
    un = np.flatnonzero(n_iter == cap1)
    if len(un) == 0:
        return np.asarray(f1_d), n_iter, np.asarray(n_used_d)

    # remaining-iteration estimate from the contraction rate at the cap:
    # eps_k ~ C rho^k  =>  n_rem ~ log(EPSILON/eps)/log(rho). Sorting the
    # compacted pairs by it groups equally-hard pairs into the same tiles.
    with np.errstate(all="ignore"):
        eps, epsp = meta[un, 1], meta[un, 2]
        rho = np.clip(eps / np.maximum(epsp, 1e-30), 1e-6, 0.9999)
        pred = np.log(np.maximum(EPSILON / np.maximum(eps, 1e-30), 1e-30)) \
            / np.log(rho)
        pred[~np.isfinite(pred)] = ITER_MAX
    order = un[np.argsort(pred)]

    padded = -(-len(order) // bucket) * bucket
    idx = np.concatenate([order, np.zeros(padded - len(order), np.int64)])
    f2_d, it2_d = _phase2(gn1, gn2, f1_d, jnp.asarray(idx, jnp.int32),
                          ignore_miss_data, pair_tile, interpret,
                          ITER_MAX - cap1)
    f = np.asarray(f1_d).copy()
    f2 = np.asarray(f2_d)[:len(order)]
    it2 = np.asarray(it2_d)[:len(order)]
    f[order] = f2
    n_iter = n_iter.copy()
    n_iter[order] = cap1 + it2
    return f, n_iter, np.asarray(n_used_d)


@functools.partial(jax.jit, static_argnames=("ignore_miss_data", "pair_tile",
                                             "interpret", "cap1", "unroll"))
def pair_em_sorted(gn1, gn2, maf1, maf2, ignore_miss_data: bool = False,
                   *, pair_tile: int = 256, interpret: bool = False,
                   cap1: int = 16, unroll: int = _UNROLL):
    """Single-jit two-phase EM with difficulty-sorted phase 2.

    Phase 1 runs everyone for up to cap1 iterations. Phase 2 re-runs ALL
    pairs (static shapes, no host sync) but permuted by the predicted
    remaining iterations — log(EPSILON/eps)/log(eps/eps_prev) from the
    phase-1 contraction rate — so converged pairs pack into tiles that exit
    after one unroll and hard pairs share tiles with equally hard ones.
    Results are bit-identical to the plain kernel: converged pairs keep
    their phase-1 state, unconverged continue exactly where they stopped
    (the phase boundary is invisible to the EM and to nIter).
    """
    P = gn1.shape[0]
    g1, g2, incf, f0, invx, n_used = _prep(gn1, gn2, maf1, maf2,
                                           ignore_miss_data, pair_tile)
    f1, it1, epsl, epsp = _run_kernel(g1, g2, f0, incf, invx,
                                      pair_tile=pair_tile, iter_cap=cap1,
                                      interpret=interpret, unroll=unroll)
    it1 = it1[0, :P]
    conv1 = it1 < cap1
    eps = epsl[0, :P]
    rho = jnp.clip(eps / jnp.maximum(epsp[0, :P], 1e-30), 1e-6, 0.9999)
    pred = jnp.log(jnp.maximum(EPSILON / jnp.maximum(eps, 1e-30), 1e-30)) \
        / jnp.log(rho)
    pred = jnp.where(jnp.isfinite(pred), pred, jnp.float32(ITER_MAX))
    pred = jnp.where(conv1, -1.0, pred)
    order = jnp.argsort(pred)

    Pp = g1.shape[2]
    pad_order = jnp.concatenate(
        [order, jnp.arange(P, Pp, dtype=order.dtype)]).astype(jnp.int32)
    g1o = jnp.take(g1, pad_order, axis=2)
    g2o = jnp.take(g2, pad_order, axis=2)
    incfo = jnp.take(incf, pad_order, axis=1)
    invxo = jnp.take(invx, pad_order, axis=1)
    f0o = jnp.take(f1, pad_order, axis=1)
    f2, it2, _, _ = _run_kernel(g1o, g2o, f0o, incfo, invxo,
                                pair_tile=pair_tile,
                                iter_cap=ITER_MAX - cap1,
                                interpret=interpret, unroll=unroll)
    # inverse of a permutation via scatter — O(P) vs the bitonic
    # argsort's O(P log^2 P) (PERF.md component budget)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(P, dtype=order.dtype))
    f2u = jnp.take(f2[:, :P], inv, axis=1)
    it2u = jnp.take(it2[0, :P], inv)
    f = jnp.where(conv1[None, :], f1[:, :P], f2u)
    n_iter = jnp.where(conv1, it1, cap1 + it2u)
    return f.T, n_iter, n_used


# ------------------------------------------------- row-layout kernel ----
#
# The column-layout path above pays ~50% of its wall time in (P, I, 3) ->
# (3, I, P) transposes (strided 4-byte HBM traffic). The row layout keeps
# PAIRS on sublanes and INDIVIDUALS on lanes: the site table is stored once
# as row-contiguous (S, 3*Ipad), a pair block is TWO contiguous row
# gathers, and the kernel reduces over lanes. No transposes anywhere on the
# per-block path.

def _em_kernel_rows(g1_ref, g2_ref, f0_ref, incf_ref, invx_ref,
                    f_out, niter_out, active_ref, *, iter_cap: int, Ip: int):
    """One grid step = one (PT, 3*Ip) pair tile; g refs hold the three
    genotype planes side by side on the lane axis."""
    g1 = [g1_ref[:, g * Ip:(g + 1) * Ip] for g in range(3)]  # (PT, Ip) each
    g2 = [g2_ref[:, g * Ip:(g + 1) * Ip] for g in range(3)]

    for k in range(4):
        f_out[:, k:k + 1] = f0_ref[:, k:k + 1]
    niter_out[:] = jnp.full(niter_out.shape, iter_cap, jnp.int32)
    active_ref[:] = jnp.ones(active_ref.shape, jnp.float32)

    def cond(carry):
        it, done = carry
        return jnp.logical_and(it < iter_cap, jnp.logical_not(done))

    def em_step(it, fs, active, n_iter):
        incf = incf_ref[:]    # (PT, Ip)
        invx = invx_ref[:]    # (PT, 1)
        Q = [[fs[2 * a] * g2[c] + fs[2 * a + 1] * g2[c + 1]
              for c in range(2)] for a in range(2)]
        D = [g1[a1k] * Q[0][a2k] + g1[a1k + 1] * Q[1][a2k]
             for (a1k, a2k) in _KBITS]
        s = fs[0] * D[0]
        for k in range(1, 4):
            s = s + fs[k] * D[k]
        r0 = pl.reciprocal(s, approx=True)
        r = incf * (r0 * (2.0 - s * r0))
        f_new = [fs[k] * jnp.sum(D[k] * r, axis=1, keepdims=True) * invx
                 for k in range(4)]
        norm = ((f_new[0] + f_new[1]) + f_new[2]) + f_new[3]
        rn0 = pl.reciprocal(norm, approx=True)
        rn = rn0 * (2.0 - norm * rn0)
        f_new = [fn * rn for fn in f_new]
        f_next = [jnp.where(active, f_new[k], fs[k]) for k in range(4)]
        eps = jnp.zeros(invx.shape, invx.dtype)
        for k in range(4):
            d = jnp.abs(f_next[k] - fs[k])
            eps = jnp.where(d > eps, d, eps)
        newly = jnp.logical_and(active, eps < EPSILON)
        still = jnp.logical_and(active, jnp.logical_not(newly))
        n_iter = jnp.where(newly, it, n_iter)
        return f_next, still, n_iter

    def body(carry):
        it, _ = carry
        fs = [f_out[:, k:k + 1] for k in range(4)]
        active = active_ref[:] > 0.0
        n_iter = niter_out[:]
        for u in range(_UNROLL):
            fs, active, n_iter = em_step(it + u, fs, active, n_iter)
        for k in range(4):
            f_out[:, k:k + 1] = fs[k]
        niter_out[:] = n_iter
        active_ref[:] = active.astype(jnp.float32)
        return it + _UNROLL, jnp.logical_not(jnp.any(active))

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))


def pick_rows_tile(n_ind: int) -> int | None:
    """Largest pair tile for the ROW-layout kernel at a given cohort size.
    Pairs ride sublanes here, so the tile shrinks all the way to 8 — the
    row kernel keeps the EM in VMEM for cohorts far beyond the column
    kernel's ceiling (pick_pair_tile: ~1.1k inds). Same empirical budget
    (56 bytes * Ip * PT <= 8 MB double-buffered)."""
    Ip = -(-n_ind // 128) * 128
    for pt in (512, 256, 128, 64, 32, 16, 8):
        if 56 * Ip * pt <= 8_000_000:
            return pt
    return None


@functools.partial(jax.jit, static_argnames=("ignore_miss_data", "pair_tile",
                                             "interpret", "iter_cap"))
def pair_em_rows_from_gl(gn1: jnp.ndarray, gn2: jnp.ndarray,
                         maf1: jnp.ndarray, maf2: jnp.ndarray,
                         ignore_miss_data: bool = False, *,
                         pair_tile: int = 128, interpret: bool = False,
                         iter_cap: int = ITER_MAX):
    """Drop-in for ops.em.pair_em via the ROW-layout kernel: builds the
    (P, 3*Ip) row layout + inclusion mask from (P, I, 3) GLs. The engine's
    large-cohort path (n_ind beyond pick_pair_tile's ceiling)."""
    P, I, _ = gn1.shape
    Ip = -(-I // 128) * 128
    rows = make_site_table  # same (N, I, 3) -> (N, 3*Ipad) layout
    if ignore_miss_data:
        include = ~(miss_mask(gn1) | miss_mask(gn2))
    else:
        include = jnp.ones((P, I), bool)
    n_used = jnp.sum(include, axis=1).astype(jnp.int32)
    incf = jnp.pad(include.astype(jnp.float32), ((0, 0), (0, Ip - I)))
    return pair_em_rows(rows(gn1), rows(gn2), incf, maf1, maf2, n_used,
                        pair_tile=pair_tile, interpret=interpret,
                        iter_cap=iter_cap)


def make_site_table(gn: jnp.ndarray):
    """(S, I, 3) normal-space GLs -> row-contiguous (S, 3*Ipad) f32 site
    table for the row-layout kernel (one-time cost; padded lanes hold 1/3
    and are masked out by incf)."""
    S, I, _ = gn.shape
    Ip = -(-I // 128) * 128
    g = jnp.pad(gn.astype(jnp.float32), ((0, 0), (0, Ip - I), (0, 0)),
                constant_values=1.0 / 3.0)
    return g.transpose(0, 2, 1).reshape(S, 3 * Ip)


@functools.partial(jax.jit, static_argnames=("pair_tile", "interpret",
                                             "iter_cap"))
def pair_em_rows(g1rows: jnp.ndarray, g2rows: jnp.ndarray,
                 incf: jnp.ndarray, maf1: jnp.ndarray, maf2: jnp.ndarray,
                 n_used: jnp.ndarray, *, pair_tile: int = 512,
                 interpret: bool = False, iter_cap: int = ITER_MAX):
    """Row-layout EM: g{1,2}rows (P, 3*Ip) gathered site rows, incf (P, Ip)
    inclusion mask (f32), n_used (P,) int32. Returns (f (P,4), n_iter (P,),
    n_used)."""
    P, threeIp = g1rows.shape
    Ip = threeIp // 3
    PT = pair_tile
    Pp = -(-P // PT) * PT
    dt = jnp.float32

    pad = ((0, Pp - P), (0, 0))
    g1 = jnp.pad(g1rows, pad, constant_values=1.0 / 3.0)
    g2 = jnp.pad(g2rows, pad, constant_values=1.0 / 3.0)
    incp = jnp.pad(incf, pad)
    # pad pairs: one live uniform-GL lane so they converge at iteration 0
    # instead of spinning the tail tile to iter_cap (see _prep)
    incp = incp.at[P:, 0].set(1.0)
    m1 = jnp.pad(maf1.astype(dt), (0, Pp - P), constant_values=0.5)
    m2 = jnp.pad(maf2.astype(dt), (0, Pp - P), constant_values=0.5)
    f0 = jnp.stack([(1 - m1) * (1 - m2), (1 - m1) * m2,
                    m1 * (1 - m2), m1 * m2], axis=1)   # (Pp, 4)
    invx = (1.0 / jnp.pad(n_used, (0, Pp - P), constant_values=1)
            .astype(dt))[:, None]

    grid = (Pp // PT,)
    blk = lambda w: pl.BlockSpec((PT, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    f, n_iter = pl.pallas_call(
        functools.partial(_em_kernel_rows, iter_cap=iter_cap, Ip=Ip),
        grid=grid,
        in_specs=[blk(3 * Ip), blk(3 * Ip), blk(4), blk(Ip), blk(1)],
        out_specs=[blk(4), blk(1)],
        out_shape=[
            jax.ShapeDtypeStruct((Pp, 4), dt),
            jax.ShapeDtypeStruct((Pp, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((PT, 1), jnp.float32)],
        interpret=interpret,
    )(g1, g2, f0, incp, invx)
    return f[:P], n_iter[:P, 0], n_used


# ------------------------------------------------ I-chunked row kernel ----
#
# The row kernel above still requires BOTH sites' full (3*Ip) rows resident
# in VMEM, capping the cohort at ~8k individuals (pick_rows_tile). Beyond
# that the engine used to fall back to the HBM-bound XLA loop — a cliff the
# reference does not have (pair_freq_iter's n_ind is unbounded,
# /root/reference/shared/gen_func.cpp:1076-1119). This kernel removes the
# cliff: the GL rows stay in HBM and stream through double-buffered DMA in
# IC-individual chunks INSIDE the EM iteration, accumulating the per-pair
# reductions in VMEM. Per-tile early exit is preserved (converged tiles
# stop streaming), so executed traffic scales with live iterations.

def _em_kernel_ichunk(g1_hbm, g2_hbm, inc_hbm, f0_ref, invx_ref,
                      f_out, niter_out, active_ref, gbuf, incbuf, sems,
                      *, iter_cap: int, IC: int, n_chunks: int, PT: int,
                      P: int, unroll: int = _UNROLL):
    """One grid step = PT pairs x the WHOLE cohort (streamed).

    g{1,2}_hbm: (Pp, NC*3*IC) chunk-major row tables (ANY memory space);
    inc_hbm: (Pp, NC*IC) inclusion mask; gbuf VMEM (2, 2, PT, 3*IC) double
    buffers for the two sites, incbuf VMEM (2, PT, IC), sems DMA((2, 3)).
    """
    i = pl.program_id(0)
    row0 = i * PT

    def chunk_dmas(slot, c):
        return (
            pltpu.make_async_copy(
                g1_hbm.at[pl.ds(row0, PT), pl.ds(c * 3 * IC, 3 * IC)],
                gbuf.at[slot, 0], sems.at[slot, 0]),
            pltpu.make_async_copy(
                g2_hbm.at[pl.ds(row0, PT), pl.ds(c * 3 * IC, 3 * IC)],
                gbuf.at[slot, 1], sems.at[slot, 1]),
            pltpu.make_async_copy(
                inc_hbm.at[pl.ds(row0, PT), pl.ds(c * IC, IC)],
                incbuf.at[slot], sems.at[slot, 2]),
        )

    for k in range(4):
        f_out[:, k:k + 1] = f0_ref[:, k:k + 1]
    niter_out[:] = jnp.full(niter_out.shape, iter_cap, jnp.int32)
    # pad rows (>= P) have all-zero inclusion -> nan frequencies that
    # never satisfy eps < EPSILON; seed them dead so the tail tile
    # converges like any other instead of spinning to iter_cap
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, active_ref.shape, 0)
    active_ref[:] = (rows < P).astype(jnp.float32)

    def cond(carry):
        it, done = carry
        return jnp.logical_and(it < iter_cap, jnp.logical_not(done))

    def em_step(it, fs, active, n_iter):
        invx = invx_ref[:]                       # (PT, 1)
        # accumulate the four per-pair reductions over streamed I-chunks
        for d in chunk_dmas(0, 0):
            d.start()

        def chunk_body(c, S):
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                for d in chunk_dmas(nxt, c + 1):
                    d.start()
            for d in chunk_dmas(slot, c):
                d.wait()
            g1c = [gbuf[slot, 0, :, g * IC:(g + 1) * IC] for g in range(3)]
            g2c = [gbuf[slot, 1, :, g * IC:(g + 1) * IC] for g in range(3)]
            inc = incbuf[slot]                   # (PT, IC)
            Q = [[fs[2 * a] * g2c[cc] + fs[2 * a + 1] * g2c[cc + 1]
                  for cc in range(2)] for a in range(2)]
            D = [g1c[a1k] * Q[0][a2k] + g1c[a1k + 1] * Q[1][a2k]
                 for (a1k, a2k) in _KBITS]
            s = fs[0] * D[0]
            for k in range(1, 4):
                s = s + fs[k] * D[k]
            r0 = pl.reciprocal(s, approx=True)
            r = inc * (r0 * (2.0 - s * r0))
            return tuple(S[k] + jnp.sum(D[k] * r, axis=1, keepdims=True)
                         for k in range(4))

        S0 = tuple(jnp.zeros((PT, 1), jnp.float32) for _ in range(4))
        S = jax.lax.fori_loop(0, n_chunks, chunk_body, S0)
        f_new = [fs[k] * S[k] * invx for k in range(4)]
        norm = ((f_new[0] + f_new[1]) + f_new[2]) + f_new[3]
        rn0 = pl.reciprocal(norm, approx=True)
        rn = rn0 * (2.0 - norm * rn0)
        f_new = [fn * rn for fn in f_new]
        f_next = [jnp.where(active, f_new[k], fs[k]) for k in range(4)]
        eps = jnp.zeros((PT, 1), jnp.float32)
        for k in range(4):
            d = jnp.abs(f_next[k] - fs[k])
            eps = jnp.where(d > eps, d, eps)
        newly = jnp.logical_and(active, eps < EPSILON)
        still = jnp.logical_and(active, jnp.logical_not(newly))
        n_iter = jnp.where(newly, it, n_iter)
        return f_next, still, n_iter

    def body(carry):
        it, _ = carry
        fs = [f_out[:, k:k + 1] for k in range(4)]
        active = active_ref[:] > 0.0
        n_iter = niter_out[:]
        for u in range(unroll):
            fs, active, n_iter = em_step(it + u, fs, active, n_iter)
        for k in range(4):
            f_out[:, k:k + 1] = fs[k]
        niter_out[:] = n_iter
        active_ref[:] = active.astype(jnp.float32)
        return it + unroll, jnp.logical_not(jnp.any(active))

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))


def pick_ichunk(n_ind: int) -> tuple[int, int]:
    """(pair_tile, i_chunk) for the streamed kernel — valid for ANY cohort
    size (the working set is 2 slots x (2 GL chunks + mask), independent
    of n_ind). IC rides the lane axis; bigger chunks amortize DMA issue
    overhead against the same total traffic."""
    return 128, 512


def make_site_table_chunked(gn: jnp.ndarray, IC: int):
    """(S, I, 3) normal-space GLs -> chunk-major (S, NC*3*IC) f32 table:
    chunk c occupies columns [c*3*IC, (c+1)*3*IC) as [g0 | g1 | g2], so a
    chunk's three planes arrive in ONE contiguous DMA."""
    S, I, _ = gn.shape
    Ip = -(-I // IC) * IC
    g = jnp.pad(gn.astype(jnp.float32), ((0, 0), (0, Ip - I), (0, 0)),
                constant_values=1.0 / 3.0)
    # (S, NC, IC, 3) -> (S, NC, 3, IC) -> flat
    return (g.reshape(S, Ip // IC, IC, 3).transpose(0, 1, 3, 2)
            .reshape(S, (Ip // IC) * 3 * IC))


@functools.partial(jax.jit, static_argnames=("ignore_miss_data", "pair_tile",
                                             "i_chunk", "interpret",
                                             "iter_cap"))
def pair_em_ichunk(gn1: jnp.ndarray, gn2: jnp.ndarray, maf1: jnp.ndarray,
                   maf2: jnp.ndarray, ignore_miss_data: bool = False, *,
                   pair_tile: int = 128, i_chunk: int = 512,
                   interpret: bool = False, iter_cap: int = ITER_MAX):
    """Drop-in for ops.em.pair_em at UNBOUNDED cohort sizes: gl (P, I, 3)
    -> (f (P,4), n_iter, n_used). The per-individual work streams from HBM
    in i_chunk slices; VMEM holds only the double buffers."""
    P, I, _ = gn1.shape
    IC = i_chunk
    PT = pair_tile
    Pp = -(-P // PT) * PT
    if ignore_miss_data:
        include = ~(miss_mask(gn1) | miss_mask(gn2))
    else:
        include = jnp.ones((P, I), bool)
    n_used = jnp.sum(include, axis=1).astype(jnp.int32)
    Ip = -(-I // IC) * IC
    n_chunks = Ip // IC
    pad = ((0, Pp - P), (0, 0))
    g1 = jnp.pad(make_site_table_chunked(gn1, IC), pad,
                 constant_values=1.0 / 3.0)
    g2 = jnp.pad(make_site_table_chunked(gn2, IC), pad,
                 constant_values=1.0 / 3.0)
    incf = jnp.pad(include.astype(jnp.float32),
                   ((0, Pp - P), (0, Ip - I)))
    m1 = jnp.pad(maf1.astype(jnp.float32), (0, Pp - P),
                 constant_values=0.5)
    m2 = jnp.pad(maf2.astype(jnp.float32), (0, Pp - P),
                 constant_values=0.5)
    f0 = jnp.stack([(1 - m1) * (1 - m2), (1 - m1) * m2,
                    m1 * (1 - m2), m1 * m2], axis=1)     # (Pp, 4)
    invx = (1.0 / jnp.pad(n_used, (0, Pp - P), constant_values=1)
            .astype(jnp.float32))[:, None]

    grid = (Pp // PT,)
    vblk = lambda w: pl.BlockSpec((PT, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    f, n_iter = pl.pallas_call(
        functools.partial(_em_kernel_ichunk, iter_cap=iter_cap, IC=IC,
                          n_chunks=n_chunks, PT=PT, P=P),
        grid=grid,
        in_specs=[anyspec, anyspec, anyspec, vblk(4), vblk(1)],
        out_specs=[vblk(4), vblk(1)],
        out_shape=[
            jax.ShapeDtypeStruct((Pp, 4), jnp.float32),
            jax.ShapeDtypeStruct((Pp, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((PT, 1), jnp.float32),            # active
            pltpu.VMEM((2, 2, PT, 3 * IC), jnp.float32),  # g double buffers
            pltpu.VMEM((2, PT, IC), jnp.float32),        # inc double buffers
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(g1, g2, incf, f0, invx)
    return f[:P], n_iter[:P, 0], n_used
