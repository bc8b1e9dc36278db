"""Strip-tile Pallas kernel: banded pair-EM over contiguous site ranges.

The gather kernel (pallas_em) pays per-PAIR data movement: two gathered
GL rows, a relayout transpose, and (for the sorted two-phase) permute
gathers — measured at ~60% of block wall time on dense plans (PERF.md).
This kernel instead computes a RECTANGLE of pairs

    tile = anchors [a0, a0+TA) x partners [b0, b0+TB)

from two CONTIGUOUS dynamic slices of site tables (no gathers, no
transposes, no sorting): the partner strip (3, Ip, TB) loads once per
tile and is reused by all TA anchors; each anchor adds one (3, Ip) row.
Data traffic per pair drops ~15x vs the gather path; out-of-band lanes
are masked dead from iteration 0, so the approach wins when the plan is
DENSE over rectangles (wide bands, all-pairs — the pod configs) and
loses when it is sparse (--rnd_sample, narrow bands), where the gather
kernel remains the engine's choice (engine.py picks by measured-model
utilization).

Per anchor the 128-lane EM runs to convergence with exact per-pair
freeze/nIter semantics (same update as pallas_em._em_kernel, the same
contract vs ops.em.pair_em: f within ~3e-5, nIter ±1 on trajectory
knife-edges). Pearson r2 on expected genotypes is computed in the same
pass from pre-standardized E[G] tables — one extra reduction per anchor,
replacing the separate XLA op AND its gathers.

Reference mapping: the hot loop is gen_func.cpp:1013-1178; the rectangle
sweep replaces the per-pair walk of calc_pair_LD (ngsLD.cpp:229-306)
with the banded block decomposition of SURVEY.md §2's TPU plan.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPSILON, ITER_MAX

_KBITS = ((0, 0), (0, 1), (1, 0), (1, 1))
_UNROLL = 10       # r4 chip sweep: unroll 10 edges 4 at group=2 (1.35 vs
                   # 1.30e10 evals/s); must divide ITER_MAX
_GROUP = 1         # anchors sharing one convergence loop (see
                   # _strip_kernel). r4 chip sweeps at I=100, 256-tile
                   # chunk (dev/exp_strip3.py): group 1 = 434 ms vs
                   # 2 = 472, 4 = 746+ — smaller em_step temporaries
                   # win; convergence granularity is intra-ROW (the 128
                   # partner lanes), so larger groups only add waste
TA = 128           # anchors per tile (sublane-major axis of outputs)
TB = 128           # partners per tile (lane axis)


def _strip_kernel(ta_ref, tb_ref,             # scalar prefetch: tile coords
                  ga_ref,    # (3, TA, Ip)    anchor strip, site-major rows
                  gb_ref,    # (3, Ip, TB)    partner strip, kernel layout
                  ea_ref,    # (TA, Ip)       standardized E[G], anchor rows
                  eb_ref,    # (Ip, TB)       standardized E[G], partners
                  mafa_ref,  # (TA, 1) f32
                  mafb_ref,  # (1, TB) f32
                  loa_ref,   # (TA, 1) i32    first live partner (incl.)
                  hia_ref,   # (TA, 1) i32    band limit (excl.)
                  oka_ref,   # (TA, 1) f32    anchor maf-ok
                  okb_ref,   # (1, TB) f32    partner maf-ok
                  f_out,     # (1, 4, TA, TB) f32
                  r2p_out,   # (1, TA, TB) f32
                  nit_out,   # (1, TA, TB) i32
                  nu_out,    # (1, TA, TB) i32
                  *rest,     # [epsl_out, epsp_out (1, TA, TB) f32,] +
                             # fs_scr (4, G, 1, TB) f32,
                             # act_scr (G, 1, TB) f32,
                             # nit_scr (G, 1, TB) i32
                             # [, epsl_scr, epsp_scr (G, 1, TB) f32]
                  I, Ip, iter_cap, ignore_miss, unroll=_UNROLL,
                  group=_GROUP, want_eps=False, first_check=None):
    """Grouped-anchor EM: G anchors share one while loop over
    (G, Ip, TB)-shaped state, so each scalar-unit convergence check
    covers G x Ip x TB evals instead of Ip x TB (G = 1 measured fastest
    on the r4 chip sweeps — the em_step temporaries shrink and the
    convergence waste is intra-row anyway; see PERF.md gap
    decomposition). State lives in VMEM scratch —
    Mosaic's while-loop lowering cannot legalize VECTOR loop carries
    (scf.yield), so only the (it, done) scalars ride the carry and the
    body loads/stores the group's fs/active/nIter once per `unroll`
    steps. Per-pair freeze/nIter semantics are unchanged — every
    anchor's pairs see the same iteration numbering the solo loop used,
    the group merely keeps iterating until its slowest anchor converges
    (executed-not-counted waste, small within a band where neighboring
    anchors have similar difficulty)."""
    if want_eps:
        (epsl_out, epsp_out, fs_scr, act_scr, nit_scr,
         epsl_scr, epsp_scr) = rest
    else:
        fs_scr, act_scr, nit_scr = rest
        epsl_out = epsp_out = epsl_scr = epsp_scr = None
    fc0 = first_check if first_check is not None else unroll
    i = pl.program_id(0)
    b0 = tb_ref[i] * TB
    G = group

    gb = [gb_ref[c] for c in range(3)]                  # (Ip, TB)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (Ip, TB), 0)
    inc_b = row_iota < I
    if ignore_miss:
        missb = (jnp.abs(gb[0] - gb[1]) < EPSILON) & \
                (jnp.abs(gb[1] - gb[2]) < EPSILON)
        inc_b = inc_b & jnp.logical_not(missb)
    b_glob = b0 + jax.lax.broadcasted_iota(jnp.int32, (1, TB), 1)
    okb = okb_ref[:] > 0.0                              # (1, TB)
    eb = eb_ref[:]                                      # (Ip, TB)

    # Pearson r2 on standardized E[G] for the WHOLE tile in one MXU
    # matmul: corr[a, b] = sum_i ea~[a, i] * eb~[i, b] (the tables carry
    # (e - mean)/(sqrt(n) * sd); ngsLD.cpp:365-367). One (TA, Ip) x
    # (Ip, TB) dot replaces TA per-anchor matvec reductions on the VPU.
    corr = jnp.dot(ea_ref[:], eb, preferred_element_type=jnp.float32)
    r2p_out[0] = corr * corr
    if not ignore_miss:
        # inclusion is anchor-independent: one reduction serves the tile
        incf_t = inc_b.astype(jnp.float32)              # (Ip, TB)
        n_used_t = jnp.sum(incf_t, axis=0, keepdims=True)   # (1, TB)
        nu_out[0] = jnp.broadcast_to(n_used_t.astype(jnp.int32), (TA, TB))

    def group_body(g, _):
        a0 = g * G
        # ---- grouped prologue: ONE block slice per table, no per-anchor
        # transposes (a (G, Ip) anchor block with a trailing unit axis IS
        # the stack of the G (Ip, 1) anchor columns — same values, no
        # G separate relayouts on the VPU) ----
        g1w = [ga_ref[c, pl.ds(a0, G), :][:, :, None]     # (G, Ip, 1)
               for c in range(3)]
        ma = mafa_ref[pl.ds(a0, G), :][:, :, None]        # (G, 1, 1)
        mb = mafb_ref[:][None]                            # (1, 1, TB)
        fsw = [(1 - ma) * (1 - mb), (1 - ma) * mb,
               ma * (1 - mb), ma * mb]                    # (G, 1, TB)
        bg = b_glob[None]                                 # (1, 1, TB)
        livew = (bg >= loa_ref[pl.ds(a0, G), :][:, :, None]) \
            & (bg < hia_ref[pl.ds(a0, G), :][:, :, None]) \
            & (oka_ref[pl.ds(a0, G), :][:, :, None] > 0.0) & okb[None]
        if ignore_miss:
            missa = (jnp.abs(g1w[0] - g1w[1]) < EPSILON) & \
                    (jnp.abs(g1w[1] - g1w[2]) < EPSILON)  # (G, Ip, 1)
            incfw = (inc_b[None]
                     & jnp.logical_not(missa)).astype(jnp.float32)
            # integral 0/1 sums in f32 are exact: identical to the old
            # per-anchor (Ip, TB) reductions regardless of lowering
            n_usedw = jnp.sum(incfw, axis=1, keepdims=True)  # (G, 1, TB)
            nu_out[0, pl.ds(a0, G), :] = \
                n_usedw[:, 0, :].astype(jnp.int32)
        else:
            incfw = incf_t[None]                          # (1, Ip, TB)
            # shape invxw (G, 1, TB) like the per-anchor version did:
            # em_step's Ip-reductions must see group-shape-INVARIANT
            # consumer shapes or XLA revectorizes them and the rounding
            # drifts between group sizes (pinned by
            # test_grouped_anchors_match_solo)
            n_usedw = jnp.broadcast_to(n_used_t[None], (G, 1, TB))
        invxw = 1.0 / n_usedw    # exact divide, once per group

        def cond(c):
            it, done = c
            return jnp.logical_and(it < iter_cap, jnp.logical_not(done))

        def em_step(it, fs, act, n_iter, eps_prev, eps_last):
            Q = [[fs[2 * x] * gb[c] + fs[2 * x + 1] * gb[c + 1]
                  for c in range(2)] for x in range(2)]   # (G, Ip, TB)
            D = [g1w[a1k] * Q[0][a2k] + g1w[a1k + 1] * Q[1][a2k]
                 for (a1k, a2k) in _KBITS]
            s = fs[0] * D[0]
            for k in range(1, 4):
                s = s + fs[k] * D[k]
            r0 = pl.reciprocal(s, approx=True)
            r = incfw * (r0 * (2.0 - s * r0))
            f_new = [fs[k] * jnp.sum(D[k] * r, axis=1, keepdims=True)
                     * invxw for k in range(4)]
            norm = ((f_new[0] + f_new[1]) + f_new[2]) + f_new[3]
            rn0 = pl.reciprocal(norm, approx=True)
            rn = rn0 * (2.0 - norm * rn0)
            f_new = [fn * rn for fn in f_new]
            f_next = [jnp.where(act, f_new[k], fs[k]) for k in range(4)]
            eps = jnp.zeros((G, 1, TB), jnp.float32)
            for k in range(4):
                d = jnp.abs(f_next[k] - fs[k])
                eps = jnp.where(d > eps, d, eps)
            if want_eps:
                eps_prev = jnp.where(act, eps_last, eps_prev)
                eps_last = jnp.where(act, eps, eps_last)
            newly = jnp.logical_and(act, eps < EPSILON)
            still = jnp.logical_and(act, jnp.logical_not(newly))
            n_iter = jnp.where(newly, it, n_iter)
            return f_next, still, n_iter, eps_prev, eps_last

        def body(c):
            it = c[0]
            fs = [fs_scr[k] for k in range(4)]
            act = act_scr[...] > 0.0
            n_iter = nit_scr[...]
            ep = epsl_scr[...] if want_eps else None
            epp = epsp_scr[...] if want_eps else None
            for u in range(unroll):
                fs, act, n_iter, epp, ep = em_step(it + u, fs, act,
                                                   n_iter, epp, ep)
            for k in range(4):
                fs_scr[k] = fs[k]
            act_scr[...] = act.astype(jnp.float32)
            nit_scr[...] = n_iter
            if want_eps:
                epsl_scr[...] = ep
                epsp_scr[...] = epp
            return it + unroll, jnp.logical_not(jnp.any(act))

        for k in range(4):
            fs_scr[k] = fsw[k]
        act_scr[...] = livew.astype(jnp.float32)
        nit_scr[...] = jnp.full((G, 1, TB), iter_cap, jnp.int32)
        if want_eps:
            # last two update magnitudes per lane (ones like the column
            # kernel, pallas_em._em_kernel)
            epsl_scr[...] = jnp.ones((G, 1, TB), jnp.float32)
            epsp_scr[...] = jnp.ones((G, 1, TB), jnp.float32)
        if first_check is None:
            # default: one while loop from 0, checkpoints every `unroll`
            # — this exact structure keeps the Ip-reduction lowering
            # identical across group sizes (grouping stays bit-invisible,
            # test_grouped_anchors_match_solo)
            jax.lax.while_loop(cond, body,
                               (jnp.int32(0), jnp.bool_(False)))
        else:
            # tuned schedule: a first trip of fc0 iterations with no
            # convergence sync, then `unroll` strides. Checkpoints: fc0,
            # fc0+unroll, ... — freeze/nIter semantics unchanged, but
            # the split-loop structure lets XLA schedule the prefix
            # differently per group size, so values may drift ~1 ulp
            # from the default structure (inside the f32 contract).
            def prefix_w(c):
                fs = [fs_scr[k] for k in range(4)]
                act = act_scr[...] > 0.0
                n_iter = nit_scr[...]
                ep = epsl_scr[...] if want_eps else None
                epp = epsp_scr[...] if want_eps else None
                for u in range(fc0):
                    fs, act, n_iter, epp, ep = em_step(u, fs, act,
                                                       n_iter, epp, ep)
                for k in range(4):
                    fs_scr[k] = fs[k]
                act_scr[...] = act.astype(jnp.float32)
                nit_scr[...] = n_iter
                if want_eps:
                    epsl_scr[...] = ep
                    epsp_scr[...] = epp
                return c + 1

            jax.lax.while_loop(lambda c: c < 1, prefix_w, jnp.int32(0))
            done0 = jnp.logical_not(jnp.any(act_scr[...] > 0.0))
            jax.lax.while_loop(cond, body, (jnp.int32(fc0), done0))
        for j in range(G):
            a = a0 + j
            for k in range(4):
                f_out[0, k, pl.ds(a, 1), :] = fs_scr[k, j]
            nit_out[0, pl.ds(a, 1), :] = nit_scr[j]
            if want_eps:
                epsl_out[0, pl.ds(a, 1), :] = epsl_scr[j]
                epsp_out[0, pl.ds(a, 1), :] = epsp_scr[j]
        return 0

    jax.lax.fori_loop(0, TA // G, group_body, 0)


def _strip_ichunk_kernel(ta_ref, tb_ref,           # scalar prefetch
                         ga_hbm,    # (3, Sa, Ip)  anchor table, ANY space
                         gb_hbm,    # (3, Ip, Sb)  partner table, ANY space
                         ea_hbm,    # (Sa, Ip)     standardized E[G]
                         eb_hbm,    # (Ip, Sb)
                         mafa_ref, mafb_ref, loa_ref, hia_ref,
                         oka_ref, okb_ref,          # per-tile VMEM blocks
                         f_out,     # (1, 4, TA, TB) f32
                         r2p_out,   # (1, TA, TB) f32
                         nit_out,   # (1, TA, TB) i32
                         nu_out,    # (1, TA, TB) i32
                         fs_scr,    # VMEM (4, TA, TB) f32   EM state
                         act_scr,   # VMEM (TA, TB) f32
                         invx_scr,  # VMEM (TA, TB) f32
                         S_scr,     # VMEM (4, TA, TB) f32   chunk sums
                         gbufa,     # VMEM (2, 3, TA, IC) f32  dbuf
                         gbufb,     # VMEM (2, 3, IC, TB) f32  dbuf
                         ebufa,     # VMEM (2, TA, IC) f32
                         ebufb,     # VMEM (2, IC, TB) f32
                         sems,      # DMA ((2, 4))
                         *, I, Ip, IC, iter_cap, ignore_miss, ga_sub):
    """Streamed variant of _strip_kernel for UNBOUNDED cohorts: the tile's
    EM state ((4+2) x TA x TB) lives in VMEM while the individual axis
    streams from HBM in IC-sized chunks INSIDE each EM iteration — the
    strip layout's key reuse survives (one partner chunk serves every
    anchor of the tile; the gather/ichunk kernel re-reads per PAIR).
    Per-iteration HBM traffic is 12*(TA+TB)*Ip bytes against
    ~15*TA*TB*Ip flops — ~80 flops/byte, far above the HBM roofline.

    The convergence loop is per TILE (all anchors share it; per-pair
    freeze/nIter semantics unchanged — extra executed iterations never
    touch frozen pairs). Anchor-subgroup ga_sub bounds the (ga_sub, IC,
    TB) elementwise temporaries. Same reference mapping as _strip_kernel
    (gen_func.cpp:1013-1178) with pair_freq_iter's unbounded-cohort
    contract (gen_func.cpp:1076-1119)."""
    i = pl.program_id(0)
    row0 = ta_ref[i] * TA
    col0 = tb_ref[i] * TB
    n_chunks = Ip // IC

    def dmas(slot, c, with_e):
        cps = [
            pltpu.make_async_copy(
                ga_hbm.at[:, pl.ds(row0, TA), pl.ds(c * IC, IC)],
                gbufa.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                gb_hbm.at[:, pl.ds(c * IC, IC), pl.ds(col0, TB)],
                gbufb.at[slot], sems.at[slot, 1]),
        ]
        if with_e:
            cps += [
                pltpu.make_async_copy(
                    ea_hbm.at[pl.ds(row0, TA), pl.ds(c * IC, IC)],
                    ebufa.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(
                    eb_hbm.at[pl.ds(c * IC, IC), pl.ds(col0, TB)],
                    ebufb.at[slot], sems.at[slot, 3]),
            ]
        return cps

    # ---- live mask, f0 init, per-pair state ----
    b_glob = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, TB), 1)
    okb = okb_ref[:] > 0.0
    live = (b_glob >= loa_ref[:]) & (b_glob < hia_ref[:]) \
        & (oka_ref[:] > 0.0) & okb                      # (TA, TB)
    ma = mafa_ref[:]                                    # (TA, 1)
    mb = mafb_ref[:]                                    # (1, TB)
    fs_scr[0] = (1 - ma) * (1 - mb)
    fs_scr[1] = (1 - ma) * mb
    fs_scr[2] = ma * (1 - mb)
    fs_scr[3] = ma * mb
    act_scr[...] = live.astype(jnp.float32)
    nit_out[0] = jnp.full((TA, TB), iter_cap, jnp.int32)

    def side_masks(slot, c):
        """Per-side inclusion for chunk c: inca (TA, IC) anchor-side and
        incb (IC, TB) partner-side f32 masks. incb carries the real-row
        test (rows < I); with --ignore_miss_data both sides subtract the
        missing test (record uniform within EPSILON, preprocess
        contract). The (TA, IC, TB) product is never materialized whole:
        n_used comes from an MXU matmul of the two sides and the EM
        applies them per anchor subgroup (a full 3-D plane is 16 MB at
        IC=256 — past the scoped-VMEM budget)."""
        rows = c * IC + jax.lax.broadcasted_iota(jnp.int32, (IC, TB), 0)
        incb = rows < I                                 # (IC, TB)
        inca = None
        if ignore_miss:
            g1 = [gbufa[slot, k] for k in range(3)]     # (TA, IC)
            g2 = [gbufb[slot, k] for k in range(3)]     # (IC, TB)
            missb = (jnp.abs(g2[0] - g2[1]) < EPSILON) & \
                    (jnp.abs(g2[1] - g2[2]) < EPSILON)
            missa = (jnp.abs(g1[0] - g1[1]) < EPSILON) & \
                    (jnp.abs(g1[1] - g1[2]) < EPSILON)  # (TA, IC)
            incb = incb & jnp.logical_not(missb)
            inca = jnp.logical_not(missa).astype(jnp.float32)
        return inca, incb.astype(jnp.float32)

    # ---- pre-pass: Pearson corr (+ n_used when ignore_miss) ----
    for d in dmas(0, 0, True):
        d.start()

    def pre_body(c, carry):
        corr, nu = carry
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            for d in dmas(nxt, c + 1, True):
                d.start()
        for d in dmas(slot, c, True):
            d.wait()
        corr = corr + jnp.dot(ebufa[slot], ebufb[slot],
                              preferred_element_type=jnp.float32)
        if ignore_miss:
            # n_used[a, b] = sum_i inca[a, i] * incb[i, b]: one MXU
            # matmul (0/1 sums in f32 are exact)
            inca, incb = side_masks(slot, c)
            nu = nu + jnp.dot(inca, incb,
                              preferred_element_type=jnp.float32)
        return corr, nu

    corr0 = jnp.zeros((TA, TB), jnp.float32)
    corr, nu = jax.lax.fori_loop(0, n_chunks, pre_body,
                                 (corr0, jnp.zeros((TA, TB), jnp.float32)))
    r2p_out[0] = corr * corr
    if ignore_miss:
        nu_out[0] = nu.astype(jnp.int32)
        invx_scr[...] = 1.0 / nu
    else:
        nu_out[0] = jnp.full((TA, TB), I, jnp.int32)
        invx_scr[...] = jnp.full((TA, TB), 1.0 / I, jnp.float32)

    # ---- EM: while loop over iterations, chunks streamed per step ----
    def cond(carry):
        it, done = carry
        return jnp.logical_and(it < iter_cap, jnp.logical_not(done))

    def body(carry):
        it = carry[0]
        fs = [fs_scr[k] for k in range(4)]              # (TA, TB)
        for d in dmas(0, 0, False):
            d.start()

        S_scr[...] = jnp.zeros((4, TA, TB), jnp.float32)

        def chunk_body(c, _):
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                for d in dmas(nxt, c + 1, False):
                    d.start()
            for d in dmas(slot, c, False):
                d.wait()
            g2 = [gbufb[slot, k] for k in range(3)]     # (IC, TB)
            rows = c * IC + jax.lax.broadcasted_iota(jnp.int32,
                                                     (IC, TB), 0)
            incb = rows < I                              # (IC, TB)
            if ignore_miss:
                missb = (jnp.abs(g2[0] - g2[1]) < EPSILON) & \
                        (jnp.abs(g2[1] - g2[2]) < EPSILON)
                incb = incb & jnp.logical_not(missb)
            incb_f = incb.astype(jnp.float32)[None]      # (1, IC, TB)

            # Subgroups run under a fori_loop with every slice through a
            # REF (dynamic pl.ds loads, disjoint S_scr stores). Lessons
            # from the round-4 chip runs, in order: a mid-index None
            # (fs[k][g0:g0+GA, None, :]) lowers to lax.gather and
            # .at[g0:g0+GA].add to lax.scatter, neither Mosaic-legal;
            # and with the subgroup loop UNROLLED the scheduler overlaps
            # many subgroups' ~3 MB of em-step temporaries (27 MB scoped
            # VMEM against the 16 MB budget). The loop bounds live
            # temporaries to one subgroup structurally.
            def sub_body(g, _):
                a0 = g * ga_sub
                g1 = [gbufa[slot, k, pl.ds(a0, ga_sub), :]
                      for k in range(3)]                # (GA, IC)
                fsg = [fs_scr[k, pl.ds(a0, ga_sub), :][:, None, :]
                       for k in range(4)]               # (GA, 1, TB)
                if ignore_miss:
                    missa = (jnp.abs(g1[0] - g1[1]) < EPSILON) & \
                            (jnp.abs(g1[1] - g1[2]) < EPSILON)
                    incg = (jnp.logical_not(missa)
                            .astype(jnp.float32)[:, :, None] * incb_f)
                else:
                    incg = incb_f                        # (1, IC, TB)
                Q = [[fsg[2 * x] * g2[cc] + fsg[2 * x + 1] * g2[cc + 1]
                      for cc in range(2)] for x in range(2)]
                D = [g1[a1k][:, :, None] * Q[0][a2k]
                     + g1[a1k + 1][:, :, None] * Q[1][a2k]
                     for (a1k, a2k) in _KBITS]           # (GA, IC, TB)
                s = fsg[0] * D[0]
                for k in range(1, 4):
                    s = s + fsg[k] * D[k]
                r0 = pl.reciprocal(s, approx=True)
                r = incg * (r0 * (2.0 - s * r0))
                for k in range(4):
                    S_scr[k, pl.ds(a0, ga_sub), :] = \
                        S_scr[k, pl.ds(a0, ga_sub), :] \
                        + jnp.sum(D[k] * r, axis=1)
                return 0

            jax.lax.fori_loop(0, TA // ga_sub, sub_body, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        S = [S_scr[k] for k in range(4)]
        act = act_scr[...] > 0.0
        invx = invx_scr[...]
        f_new = [fs[k] * S[k] * invx for k in range(4)]
        norm = ((f_new[0] + f_new[1]) + f_new[2]) + f_new[3]
        rn0 = pl.reciprocal(norm, approx=True)
        rn = rn0 * (2.0 - norm * rn0)
        f_new = [fn * rn for fn in f_new]
        f_next = [jnp.where(act, f_new[k], fs[k]) for k in range(4)]
        eps = jnp.zeros((TA, TB), jnp.float32)
        for k in range(4):
            d = jnp.abs(f_next[k] - fs[k])
            eps = jnp.where(d > eps, d, eps)
        newly = jnp.logical_and(act, eps < EPSILON)
        still = jnp.logical_and(act, jnp.logical_not(newly))
        nit_out[0] = jnp.where(newly, it, nit_out[0])
        for k in range(4):
            fs_scr[k] = f_next[k]
        act_scr[...] = still.astype(jnp.float32)
        return it + 1, jnp.logical_not(jnp.any(still))

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))
    for k in range(4):
        f_out[0, k] = fs_scr[k]


def strip_tables(gn, eg, n_ind: int, i_align: int = 8):
    """Build the strip kernel's device tables from the engine's
    preprocessed site-major arrays.

    gn (S, I, 3) normal-space GLs -> ga (3, S, Ip) + gb (3, Ip, S), padded
    individuals hold the uniform 1/3 record (masked out via the in-kernel
    rows<I test). eg (S, I) expected genotypes -> standardized tables
    ea (S, Ip), eb (Ip, S) carrying (e - mean)/(sqrt(n)*sd) so a pair's
    Pearson r2 is the squared dot product (zero-variance sites produce
    inf/nan exactly like the two-pass formula's 0-division).

    i_align: individual-axis padding quantum — 8 for the VMEM-resident
    kernel, the I-chunk size for the streamed kernel (strip_ic)."""
    S, I, _ = gn.shape
    assert I == n_ind, (I, n_ind)   # cross-check the caller's cohort size
    Ip = -(-I // i_align) * i_align
    g = jnp.pad(gn.astype(jnp.float32), ((0, 0), (0, Ip - I), (0, 0)),
                constant_values=1.0 / 3.0)
    ga = g.transpose(2, 0, 1)
    gb = g.transpose(2, 1, 0)
    e = eg.astype(jnp.float32)
    mean = jnp.mean(e, axis=1, keepdims=True)
    c = e - mean
    ss = jnp.sum(c * c, axis=1, keepdims=True)
    et = jnp.pad(c / jnp.sqrt(ss), ((0, 0), (0, Ip - I)))
    return ga, gb, et, et.T


def vmem_ok(n_ind: int) -> bool:
    """Whether one tile's working set fits the scoped-VMEM budget: two
    strips + E[G] strips (double-buffered) + per-tile outputs against the
    ~8 MB empirical ceiling (see pallas_em.pick_pair_tile)."""
    Ip = -(-n_ind // 8) * 8
    strips = 2 * (3 * Ip * max(TA, TB) * 4) * 2      # g strips, dbuf
    estrips = 2 * (Ip * max(TA, TB) * 4) * 2
    outs = (4 + 3) * TA * TB * 4 * 2
    return strips + estrips + outs <= 8_000_000


def _default_group(Ip: int) -> int:
    """Anchors per convergence loop: as large as the em_step temporaries
    allow. ~12 (G, Ip, TB) f32 planes are live per step; keeping
    G * Ip <= 1024 holds that under ~6 MB of VMEM alongside the
    double-buffered strips. NGSLD_STRIP_GROUP overrides (must divide TA)."""
    import os
    env = os.environ.get("NGSLD_STRIP_GROUP")
    if env is not None:
        g = int(env)
        if g < 1 or TA % g:
            raise ValueError(f"NGSLD_STRIP_GROUP must divide TA={TA}: {g}")
        return g
    g = _GROUP
    while g > 1 and g * Ip > 1024:
        g //= 2
    return g


IC_STREAM = 128    # I-chunk for the streamed kernel (lane-width multiple)
_GA_SUB = 8        # anchors per streamed-EM subgroup: the fori_loop's
                   # anchor-axis slices (gbufa dim 2 = sublanes) must be
                   # STATICALLY 8-aligned — the r4 Mosaic toolchain
                   # rejects j*4 offsets ("cannot statically prove that
                   # index in dimension 2 is a multiple of 8"); 8x128
                   # keeps the (GA, IC, TB) f32 em-step temporaries at
                   # the same bytes as the old 4x256 while proving
                   # alignment, and the fori_loop bounds them
                   # structurally alongside the (now halved) buffers


def _ic_stream() -> int:
    import os
    return int(os.environ.get("NGSLD_STRIP_IC", IC_STREAM))


def strip_streamed(n_ind: int) -> bool:
    """Whether strip_em picks the streamed (I-chunked) kernel: whenever
    the whole-strip working set no longer fits VMEM (vmem_ok), the tile
    streams the individual axis instead — n_ind is unbounded, like the
    reference's pair_freq_iter (gen_func.cpp:1076-1119).
    NGSLD_STRIP_STREAM=1 forces it at any cohort size (tests)."""
    import os
    if os.environ.get("NGSLD_STRIP_STREAM") == "1":
        return True
    return not vmem_ok(n_ind)


def strip_i_align(n_ind: int) -> int:
    """Individual-axis padding quantum strip_tables must use so the
    tables match the kernel strip_em will pick for this cohort size."""
    return _ic_stream() if strip_streamed(n_ind) else 8


@functools.partial(jax.jit, static_argnames=("n_ind", "iter_cap",
                                             "ignore_miss", "interpret",
                                             "group", "unroll",
                                             "want_eps", "first_check"))
def strip_em(ga, gb, ea, eb, maf_a, maf_b, lo, hi, ok_a, ok_b, ta, tb,
             *, n_ind: int,
             iter_cap: int = ITER_MAX, ignore_miss: bool = False,
             interpret: bool = False, group: int | None = None,
             unroll: int = _UNROLL, want_eps: bool = False,
             first_check: int | None = None):
    """Run one batch of tiles.

    ga (3, Sa, Ip), gb (3, Ip, Sb), ea (Sa, Ip), eb (Ip, Sb): strip
    tables (strip_tables) — the anchor (Sa) and partner (Sb) axes may be
    DIFFERENT site ranges (the ring's visiting sub-blocks);
    maf_a/ok_a/lo/hi are (Sa,) per-anchor vectors, maf_b/ok_b (Sb,);
    lo/hi are i32 live-partner bounds [lo, hi) in the PARTNER-AXIS
    coordinate system (global site indices for a triangle sweep: lo =
    a+1; step-local indices for the ring); ta/tb (n_tiles,) i32 tile
    coordinates in TA/TB units. Returns
    f (n, 4, TA, TB) f32, r2p (n, TA, TB) f32, n_iter (n, TA, TB) i32,
    n_used (n, TA, TB) i32. Dead cells (out of band / triangle / maf)
    hold the f0 init and n_iter == iter_cap; callers mask them.

    Cohorts past the VMEM-resident limit (strip_streamed) automatically
    take the STREAMED kernel (_strip_ichunk_kernel): tables then must be
    built with strip_tables(..., i_align=strip_i_align(n_ind)).
    """
    # the while body runs `unroll` exact steps between scalar checks; a
    # cap that is not a multiple would overshoot it (see pallas_em).
    # first_check (default unroll) sets the FIRST checkpoint: the prefix
    # runs inline without scratch round-trips or scalar syncs.
    fc0 = first_check if first_check is not None else unroll
    assert 0 < fc0 <= iter_cap and (iter_cap - fc0) % unroll == 0, \
        (iter_cap, fc0, unroll)
    n = ta.shape[0]
    Ip = ga.shape[2]
    mafa = maf_a.reshape(-1, 1).astype(jnp.float32)
    mafb = maf_b.reshape(1, -1).astype(jnp.float32)
    loa = lo.reshape(-1, 1).astype(jnp.int32)
    hia = hi.reshape(-1, 1).astype(jnp.int32)
    oka = ok_a.reshape(-1, 1).astype(jnp.float32)
    okb = ok_b.reshape(1, -1).astype(jnp.float32)
    if strip_streamed(n_ind):
        assert not want_eps, "eps export: VMEM-resident strip kernel only"
        IC = _ic_stream()
        if Ip % IC:     # tables built without streaming alignment
            raise ValueError(
                f"streamed strip kernel needs Ip % {IC} == 0; "
                f"build tables with strip_tables(..., i_align="
                f"strip_i_align(n_ind)) (got Ip={Ip})")
        kernel = functools.partial(
            _strip_ichunk_kernel, I=n_ind, Ip=Ip, IC=IC,
            iter_cap=iter_cap, ignore_miss=ignore_miss, ga_sub=_GA_SUB)
        f, r2p, nit, nu = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),   # ga
                    pl.BlockSpec(memory_space=pl.ANY),   # gb
                    pl.BlockSpec(memory_space=pl.ANY),   # ea
                    pl.BlockSpec(memory_space=pl.ANY),   # eb
                    pl.BlockSpec((TA, 1), lambda i, ta, tb: (ta[i], 0)),
                    pl.BlockSpec((1, TB), lambda i, ta, tb: (0, tb[i])),
                    pl.BlockSpec((TA, 1), lambda i, ta, tb: (ta[i], 0)),
                    pl.BlockSpec((TA, 1), lambda i, ta, tb: (ta[i], 0)),
                    pl.BlockSpec((TA, 1), lambda i, ta, tb: (ta[i], 0)),
                    pl.BlockSpec((1, TB), lambda i, ta, tb: (0, tb[i])),
                ],
                out_specs=[
                    pl.BlockSpec((1, 4, TA, TB),
                                 lambda i, ta, tb: (i, 0, 0, 0)),
                    pl.BlockSpec((1, TA, TB), lambda i, ta, tb: (i, 0, 0)),
                    pl.BlockSpec((1, TA, TB), lambda i, ta, tb: (i, 0, 0)),
                    pl.BlockSpec((1, TA, TB), lambda i, ta, tb: (i, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((4, TA, TB), jnp.float32),     # fs
                    pltpu.VMEM((TA, TB), jnp.float32),        # act
                    pltpu.VMEM((TA, TB), jnp.float32),        # invx
                    pltpu.VMEM((4, TA, TB), jnp.float32),     # S sums
                    pltpu.VMEM((2, 3, TA, IC), jnp.float32),  # ga dbuf
                    pltpu.VMEM((2, 3, IC, TB), jnp.float32),  # gb dbuf
                    pltpu.VMEM((2, TA, IC), jnp.float32),     # ea dbuf
                    pltpu.VMEM((2, IC, TB), jnp.float32),     # eb dbuf
                    pltpu.SemaphoreType.DMA((2, 4)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((n, 4, TA, TB), jnp.float32),
                jax.ShapeDtypeStruct((n, TA, TB), jnp.float32),
                jax.ShapeDtypeStruct((n, TA, TB), jnp.int32),
                jax.ShapeDtypeStruct((n, TA, TB), jnp.int32),
            ],
            interpret=interpret,
        )(ta, tb, ga, gb, ea, eb, mafa, mafb, loa, hia, oka, okb)
        return f, r2p, nit, nu
    if group is None:
        group = _default_group(Ip)
    assert group >= 1 and TA % group == 0, group
    kernel = functools.partial(_strip_kernel, I=n_ind, Ip=Ip,
                               iter_cap=iter_cap, ignore_miss=ignore_miss,
                               unroll=unroll, group=group,
                               want_eps=want_eps, first_check=first_check)
    eps_out_specs = [pl.BlockSpec((1, TA, TB), lambda i, ta, tb: (i, 0, 0)),
                     pl.BlockSpec((1, TA, TB),
                                  lambda i, ta, tb: (i, 0, 0))] \
        if want_eps else []
    eps_out_shape = [jax.ShapeDtypeStruct((n, TA, TB), jnp.float32),
                     jax.ShapeDtypeStruct((n, TA, TB), jnp.float32)] \
        if want_eps else []
    eps_scratch = [pltpu.VMEM((group, 1, TB), jnp.float32),
                   pltpu.VMEM((group, 1, TB), jnp.float32)] \
        if want_eps else []
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((3, TA, Ip), lambda i, ta, tb: (0, ta[i], 0)),
                pl.BlockSpec((3, Ip, TB), lambda i, ta, tb: (0, 0, tb[i])),
                pl.BlockSpec((TA, Ip), lambda i, ta, tb: (ta[i], 0)),
                pl.BlockSpec((Ip, TB), lambda i, ta, tb: (0, tb[i])),
                pl.BlockSpec((TA, 1), lambda i, ta, tb: (ta[i], 0)),
                pl.BlockSpec((1, TB), lambda i, ta, tb: (0, tb[i])),
                pl.BlockSpec((TA, 1), lambda i, ta, tb: (ta[i], 0)),
                pl.BlockSpec((TA, 1), lambda i, ta, tb: (ta[i], 0)),
                pl.BlockSpec((TA, 1), lambda i, ta, tb: (ta[i], 0)),
                pl.BlockSpec((1, TB), lambda i, ta, tb: (0, tb[i])),
            ],
            out_specs=[
                pl.BlockSpec((1, 4, TA, TB),
                             lambda i, ta, tb: (i, 0, 0, 0)),
                pl.BlockSpec((1, TA, TB), lambda i, ta, tb: (i, 0, 0)),
                pl.BlockSpec((1, TA, TB), lambda i, ta, tb: (i, 0, 0)),
                pl.BlockSpec((1, TA, TB), lambda i, ta, tb: (i, 0, 0)),
            ] + eps_out_specs,
            scratch_shapes=[pltpu.VMEM((4, group, 1, TB), jnp.float32),
                            pltpu.VMEM((group, 1, TB), jnp.float32),
                            pltpu.VMEM((group, 1, TB), jnp.int32)]
            + eps_scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n, 4, TA, TB), jnp.float32),
            jax.ShapeDtypeStruct((n, TA, TB), jnp.float32),
            jax.ShapeDtypeStruct((n, TA, TB), jnp.int32),
            jax.ShapeDtypeStruct((n, TA, TB), jnp.int32),
        ] + eps_out_shape,
        interpret=interpret,
    )(ta, tb, ga, gb, ea, eb, mafa, mafb, loa, hia, oka, okb)
    return out  # (f, r2p, nit, nu[, epsl, epsp])


@functools.partial(jax.jit, static_argnames=("n_ind", "iter_cap",
                                             "ignore_miss", "interpret",
                                             "use_i16", "slim_im",
                                             "group", "unroll",
                                             "first_check"))
def strip_em_compact(ga, gb, ea, eb, maf_a, maf_b, lo, hi, ok_a, ok_b,
                     ta, tb, sel, *, n_ind: int,
                     iter_cap: int = ITER_MAX, ignore_miss: bool = False,
                     interpret: bool = False, use_i16: bool = True,
                     slim_im: bool = False,
                     group: int | None = None, unroll: int = _UNROLL,
                     first_check: int | None = None):
    """strip_em + ON-DEVICE row compaction.

    `sel` (C,) int32 holds flat indices into the (n_tiles, TA, TB) cell
    space, in the caller's emission order (plan.strips.strip_sel_group),
    padded to a fixed capacity C with repeats of index 0. Only the
    gathered survivor rows ever leave the device:

        fm (C, 5) f32  = [r2p, f00, f01, f10, f11]
        im (C, 2) i16  = [n_iter, n_used]   (i32 when n_ind > 32767)

    so host-link bytes scale with LIVE pairs (24 B/pair), not rectangle
    area — the difference between the strip sweep winning and losing
    end-to-end on slow links (PERF.md round-2 measurement: full-tile
    pulls inflated bytes by ~1/utilization). Callers slice [:n_live]
    before pulling.

    slim_im=True drops n_used and narrows n_iter to int8 — im (C, 1) i8
    (21 B/pair). Valid only when ignore_miss is False: every pair then
    uses all n_ind individuals (the in-kernel inclusion mask is just
    rows < I), so the host synthesizes the constant column; n_iter is
    bounded by ITER_MAX == 100 (gen_func.hpp:18) which fits i8."""
    f, r2p, nit, nu = strip_em(
        ga, gb, ea, eb, maf_a, maf_b, lo, hi, ok_a, ok_b, ta, tb,
        n_ind=n_ind, iter_cap=iter_cap, ignore_miss=ignore_miss,
        interpret=interpret, group=group, unroll=unroll,
        first_check=first_check)
    n = ta.shape[0]
    ff = f.transpose(0, 2, 3, 1).reshape(n * TA * TB, 4)
    fm = jnp.concatenate([jnp.take(r2p.reshape(-1), sel)[:, None],
                          jnp.take(ff, sel, axis=0)], axis=1)
    if slim_im:
        assert not ignore_miss, "slim_im requires the constant-n_used mode"
        im = jnp.take(nit.reshape(-1), sel).astype(jnp.int8)[:, None]
    else:
        idt = jnp.int16 if use_i16 else jnp.int32
        im = jnp.stack([jnp.take(nit.reshape(-1), sel).astype(idt),
                        jnp.take(nu.reshape(-1), sel).astype(idt)], axis=1)
    return fm, im


@functools.partial(jax.jit, static_argnames=("n_ind", "iter_cap",
                                              "ignore_miss", "interpret",
                                              "use_i16", "slim_im",
                                              "group", "unroll",
                                              "first_check"))
def strip_em_flat(ga, gb, ea, eb, maf_a, maf_b, lo, hi, ok_a, ok_b,
                  ta, tb, *, n_ind: int,
                  iter_cap: int = ITER_MAX, ignore_miss: bool = False,
                  interpret: bool = False, use_i16: bool = True,
                  slim_im: bool = False,
                  group: int | None = None, unroll: int = _UNROLL,
                  first_check: int | None = None):
    """strip_em + FLAT cell-major emission (no on-device gather).

    Returns every cell of the chunk's tiles as dense rows in (tile, a, b)
    order: fm (n*TA*TB, 5) f32, im (n*TA*TB, 1) i8 / (…, 2) i16 — the
    SAME flat index space strip_em_compact's `sel` addresses, so the
    host applies sel as a numpy take instead of the device gather.

    Why: the r4 chip decomposition (PERF.md) put the sel-compaction
    take()s at ~80-108 ms per 4M-pair chunk — TPU gathers of 16 B rows
    run at ~0.6 GB/s effective, while this relayout (one transpose +
    concat) moves at transpose speed. The trade is pull bytes: ALL cells
    cross the link (21 B/cell vs 21 B/live-pair), so the engine picks
    this form only for chunks whose live-cell fraction is near 1
    (engine_block NGSLD_STRIP_EMIT auto rule) — exactly the dense-band
    chunks where the take() was pure reordering overhead."""
    f, r2p, nit, nu = strip_em(
        ga, gb, ea, eb, maf_a, maf_b, lo, hi, ok_a, ok_b, ta, tb,
        n_ind=n_ind, iter_cap=iter_cap, ignore_miss=ignore_miss,
        interpret=interpret, group=group, unroll=unroll,
        first_check=first_check)
    n = ta.shape[0]
    ff = f.transpose(0, 2, 3, 1).reshape(n * TA * TB, 4)
    fm = jnp.concatenate([r2p.reshape(n * TA * TB, 1), ff], axis=1)
    if slim_im:
        assert not ignore_miss, "slim_im requires the constant-n_used mode"
        im = nit.reshape(n * TA * TB).astype(jnp.int8)[:, None]
    else:
        idt = jnp.int16 if use_i16 else jnp.int32
        im = jnp.stack([nit.reshape(-1).astype(idt),
                        nu.reshape(-1).astype(idt)], axis=1)
    return fm, im
