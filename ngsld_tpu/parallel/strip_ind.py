"""Strip-rectangle sweep with the INDIVIDUAL axis sharded over the mesh.

The block engine's dense sweep loads two contiguous site strips per
(anchors x partners) tile — no per-pair gathers (kernels/pallas_strip).
For cohorts whose tables must split across devices (--shard_ind), this
module runs the same rectangle computation under a ('pairs', 'ind')
shard_map: tiles split over 'pairs' like the 1-D strip path, strip
tables split over 'ind' (each device holds an individual slice of every
site record), and every per-individual reduction of the EM — the
denominator counts, the per-iteration numerator sums S_k, the Pearson
moments — becomes one psum over ICI per EM iteration
(pallas_strip._strip_ichunk_kernel's S_scr chunk sums, lifted across the
mesh). The EM state f stays replicated along 'ind': every shard applies
the identical post-psum update, so freeze/nIter decisions agree bitwise
across shards (the same lockstep contract as parallel.sweep).

The per-iteration step is XLA (not Pallas): a collective cannot run
inside a Pallas kernel body, so the convergence loop lives in
lax.while_loop with the rectangle contraction expressed as fused
elementwise + reduce ops. Data movement keeps the strip path's shape —
contiguous dynamic slices, partner-strip reuse across the tile's
anchors — which is the property that makes dense large-cohort plans lose
on the gathered-pair fallback this replaces (engine_block routed
--shard_ind dense runs to the gather sweep before round 5).

Reference mapping: same hot loop as pallas_strip (pair_freq_iter,
/root/reference/shared/gen_func.cpp:1076-1119); the reference has no
cohort-axis parallelism at all (SURVEY.md §2 "Parallelism strategies").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..constants import EPSILON, ITER_MAX

_KBITS = ((0, 0), (0, 1), (1, 0), (1, 1))
TA = 128
TB = 128


def _tile_step(g1, g2, e1, e2, mafa, mafb, loa, hia, oka, okb,
               b0, i_start, n_ind, ignore_miss, iter_cap):
    """One (TA x TB) rectangle on THIS shard's individual slice.

    g1 (3, TA, Ipl) anchor strip, g2 (3, Ipl, TB) partner strip,
    e1 (TA, Ipl) / e2 (Ipl, TB) standardized E[G] (strip_tables layout);
    i_start = this shard's global row offset (rows >= n_ind are padding).
    Returns f (4, TA, TB), r2p, nit, nu — identical (replicated) on every
    'ind' shard after the psums."""
    Ipl = g1.shape[2]
    dt = jnp.float32

    rows_a = i_start + jax.lax.broadcasted_iota(jnp.int32, (TA, Ipl), 1)
    rows_b = i_start + jax.lax.broadcasted_iota(jnp.int32, (Ipl, TB), 0)
    inca = (rows_a < n_ind).astype(dt)                    # (TA, Ipl)
    incb = (rows_b < n_ind).astype(dt)                    # (Ipl, TB)
    if ignore_miss:
        missa = (jnp.abs(g1[0] - g1[1]) < EPSILON) & \
                (jnp.abs(g1[1] - g1[2]) < EPSILON)
        missb = (jnp.abs(g2[0] - g2[1]) < EPSILON) & \
                (jnp.abs(g2[1] - g2[2]) < EPSILON)
        inca = inca * jnp.logical_not(missa).astype(dt)
        incb = incb * jnp.logical_not(missb).astype(dt)
        # n_used[a, b] = sum_i inca[a, i] incb[i, b]: local matmul
        # (exact 0/1 sums in f32), cohort sum over the 'ind' axis
        nu = jax.lax.psum(
            jnp.dot(inca, incb, preferred_element_type=dt), "ind")
    else:
        nu = jnp.full((TA, TB), float(n_ind), dt)
    inc = inca[:, :, None] * incb[None]                   # (TA, Ipl, TB)

    # Pearson r2: tables carry (e - mean)/(sqrt(n) sd) (global moments —
    # strip_tables runs under GSPMD on the 'ind'-sharded arrays), so the
    # squared cohort dot product is the two-pass GSL correlation
    # (ngsLD.cpp:365-367)
    corr = jax.lax.psum(jnp.dot(e1, e2, preferred_element_type=dt), "ind")
    r2p = corr * corr

    b_glob = b0 + jax.lax.broadcasted_iota(jnp.int32, (1, TB), 1)
    live = (b_glob >= loa) & (b_glob < hia) & (oka > 0.0) & (okb > 0.0)

    ma = mafa.astype(dt)                                  # (TA, 1)
    mb = mafb.astype(dt)                                  # (1, TB)
    f0 = jnp.stack([(1 - ma) * (1 - mb), (1 - ma) * mb,
                    ma * (1 - mb), ma * mb])              # (4, TA, TB)
    invx = 1.0 / nu
    g1w = [g1[c][:, :, None] for c in range(3)]           # (TA, Ipl, 1)
    g2w = [g2[c][None] for c in range(3)]                 # (1, Ipl, TB)

    def cond(c):
        it, fs, act, nit = c
        return jnp.logical_and(it < iter_cap, jnp.any(act))

    def body(c):
        it, fs, act, nit = c
        fk = [fs[k][:, None, :] for k in range(4)]        # (TA, 1, TB)
        Q = [[fk[2 * x] * g2w[cc] + fk[2 * x + 1] * g2w[cc + 1]
              for cc in range(2)] for x in range(2)]      # (TA, Ipl, TB)
        D = [g1w[a1k] * Q[0][a2k] + g1w[a1k + 1] * Q[1][a2k]
             for (a1k, a2k) in _KBITS]
        s = fk[0] * D[0]
        for k in range(1, 4):
            s = s + fk[k] * D[k]
        r = inc / s
        # local partial sums; the cohort reduction spans the 'ind' axis —
        # one psum of (4, TA, TB) per EM iteration (the strip kernel's
        # per-chunk S sums, pallas_strip.py S_scr, lifted across devices)
        S = jnp.stack([jnp.sum(D[k] * r, axis=1) for k in range(4)])
        S = jax.lax.psum(S, "ind")
        f_new = fs * S * invx[None]
        f_new = f_new / jnp.sum(f_new, axis=0, keepdims=True)
        f_next = jnp.where(act[None], f_new, fs)
        eps = jnp.max(jnp.abs(f_next - fs), axis=0)
        newly = jnp.logical_and(act, eps < EPSILON)
        nit = jnp.where(newly, it, nit)
        return it + 1, f_next, jnp.logical_and(act,
                                               jnp.logical_not(newly)), nit

    carry = (jnp.int32(0), f0, live,
             jnp.full((TA, TB), iter_cap, jnp.int32))
    _, f, _, nit = jax.lax.while_loop(cond, body, carry)
    return f, r2p, nit, nu.astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def strip_compute_ind_fn(n_shards: int, shard_ind: int, n_ind: int,
                         ignore_miss: bool, use_i16: bool,
                         iter_cap: int = ITER_MAX):
    """Build the jitted ('pairs','ind')-sharded strip-chunk compute for
    the block engine: same call shape as compute._strip_compute_fn
    ((tables..., per-site vectors, ta, tb, sel) -> (fm, im)) so
    engine_block dispatches either interchangeably. Returns (fn, mesh).

    Tables must be 'ind'-sharded on their Ip axis (Ip % shard_ind == 0;
    engine_block builds them with i_align = 8 * shard_ind)."""
    from .mesh import make_mesh
    mesh = make_mesh(n_shards, shard_ind,
                     devices=jax.devices()[:n_shards * shard_ind])

    def tiles(ga_l, gb_l, ea_l, eb_l, mafa, mafb, lo, hi, oka, okb,
              ta_l, tb_l):
        i_start = jax.lax.axis_index("ind") * ga_l.shape[2]

        def one(tc):
            k, j = tc[0], tc[1]
            g1 = jax.lax.dynamic_slice(
                ga_l, (0, k * TA, 0), (3, TA, ga_l.shape[2]))
            g2 = jax.lax.dynamic_slice(
                gb_l, (0, 0, j * TB), (3, gb_l.shape[1], TB))
            e1 = jax.lax.dynamic_slice(
                ea_l, (k * TA, 0), (TA, ea_l.shape[1]))
            e2 = jax.lax.dynamic_slice(
                eb_l, (0, j * TB), (eb_l.shape[0], TB))
            mafa_t = jax.lax.dynamic_slice(mafa, (k * TA,), (TA,))[:, None]
            mafb_t = jax.lax.dynamic_slice(mafb, (j * TB,), (TB,))[None]
            loa = jax.lax.dynamic_slice(lo, (k * TA,), (TA,))[:, None]
            hia = jax.lax.dynamic_slice(hi, (k * TA,), (TA,))[:, None]
            oka_t = jax.lax.dynamic_slice(oka, (k * TA,), (TA,))[:, None]
            okb_t = jax.lax.dynamic_slice(okb, (j * TB,), (TB,))[None]
            return _tile_step(g1, g2, e1, e2, mafa_t, mafb_t, loa, hia,
                              oka_t, okb_t, j * TB, i_start, n_ind,
                              ignore_miss, iter_cap)

        # sequential over the shard's tiles: bounds the (TA, Ipl, TB)
        # step temporaries to one rectangle at a time
        return jax.lax.map(one, jnp.stack([ta_l, tb_l], axis=1))

    rep, shd = P(), P("pairs")
    sharded = shard_map(
        tiles, mesh=mesh,
        in_specs=(P(None, None, "ind"), P(None, "ind", None),
                  P(None, "ind"), P("ind", None),
                  rep, rep, rep, rep, rep, rep, shd, shd),
        out_specs=(shd, shd, shd, shd), check_vma=False)

    def compute(ga, gb, ea, eb, mafa, mafb, lo, hi, oka, okb, ta, tb,
                sel):
        f, r2p, nit, nu = sharded(ga, gb, ea, eb, mafa, mafb, lo, hi,
                                  oka, okb, ta, tb)
        n = ta.shape[0]
        ff = f.transpose(0, 2, 3, 1).reshape(n * TA * TB, 4)
        fm = jnp.concatenate([jnp.take(r2p.reshape(-1), sel)[:, None],
                              jnp.take(ff, sel, axis=0)], axis=1)
        if not ignore_miss:
            im = jnp.take(nit.reshape(-1), sel).astype(jnp.int8)[:, None]
        else:
            idt = jnp.int16 if use_i16 else jnp.int32
            im = jnp.stack([jnp.take(nit.reshape(-1), sel).astype(idt),
                            jnp.take(nu.reshape(-1), sel).astype(idt)],
                           axis=1)
        return fm, im

    return jax.jit(compute), mesh
