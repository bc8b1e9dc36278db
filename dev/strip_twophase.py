"""Two-phase strip sweep (phase A rectangle cap + per-pair tail) — DEMOTED
to a dev/ experiment in round 5 (VERDICT r4 weak item 7).

Chip measurements (PERF.md r4): single-phase 655 ms vs two-phase
692-857 ms on the bench chunk — the XLA survivor compaction
(gather/scatter at ~0.6-1.5 GB/s, ~350 ms total) costs more than the
saved rectangle iterations. Round 5's flat cell-major emission removed
the single-phase path's own compaction cost (425 ms, PERF.md r5), which
moves the bar FURTHER away: phase A (~180 ms) + survivor pipeline
(~330 ms measured) lands at best ~level with the flat single phase while
adding a scatter-merge and an overflow-retry protocol. Parked here with
the measurements; the engine ships single-phase only.

Run `python dev/strip_twophase.py` for an interpret-mode parity check
against strip_em_compact (the old unit test).
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from ngsld_tpu.constants import ITER_MAX, EPSILON  # noqa: E402
from ngsld_tpu.kernels.pallas_strip import TA, TB, strip_em  # noqa: E402

@functools.partial(jax.jit, static_argnames=(
    "n_ind", "cap1", "surv_cap", "iter_cap", "ignore_miss", "interpret",
    "use_i16", "slim_im", "group", "unroll", "phase2_tile",
    "phase2_unroll"))
def strip_em_twophase(ga, gb, ea, eb, maf_a, maf_b, lo, hi, ok_a, ok_b,
                      ta, tb, sel, n_live, *, n_ind: int, cap1: int = 30,
                      surv_cap: int = 65536, iter_cap: int = ITER_MAX,
                      ignore_miss: bool = False, interpret: bool = False,
                      use_i16: bool = True, slim_im: bool = False,
                      group: int | None = None, unroll: int = 10,
                      phase2_tile: int = 256, phase2_unroll: int = 5):
    """Two-phase strip sweep: rectangle phase A to cap1, survivors finish
    per-PAIR in the warm-started column kernel.

    The strip kernel's convergence loop is shared by an anchor group's
    G x TB lanes, so a rectangle runs to its SLOWEST lane: on the bench
    workload counted/executed is 0.22 at full cap (dev/exp_sched.py from
    real nIter data) — the hot kernel wastes ~4.6x its useful work on
    already-converged lanes. Phase A caps that waste at cap1 iterations
    (covering ~p75-p90 of pairs at rectangle speed); the unconverged
    tail top_k-compacts ON DEVICE (hardest-first via the eps contraction
    estimate, exactly pair_em_sorted's predictor), continues in
    pallas_em._run_kernel seeded with its phase-A frequencies (per-pair
    freeze granularity), and scatter-merges back. Phase B sources its GL
    columns from the SAME strip tables (ga rows / gb columns are the
    per-site records, pad individuals already 1/3-uniform like
    pallas_em._layout), so no extra device tables are needed.

    The phase boundary is invisible to the EM state (f carries over
    exactly; nIter = cap1 + phase-B iterations) but phase B reduces over
    individuals in the column layout, whose sum order differs from the
    strip kernel's — survivors land within the established cross-kernel
    contract (f ~3e-5, nIter +/-1 on knife-edges) instead of
    bit-matching the single-phase strip. Pairs converged in phase A are
    bit-identical to single-phase (freeze semantics).

    Returns (fm (C, 5) f32, im, n_surv i32). n_surv > surv_cap means the
    tail overflowed the static budget and the caller must redo the chunk
    single-phase (the overflow rows' results would be phase-A state).
    Reference mapping: same hot loop as strip_em
    (gen_func.cpp:1013-1178, calc_pair_LD ngsLD.cpp:229-306)."""
    from ngsld_tpu.kernels.pallas_em import _run_kernel
    assert cap1 % unroll == 0 and cap1 < iter_cap, (cap1, unroll)
    assert (iter_cap - cap1) % phase2_unroll == 0, (iter_cap, cap1,
                                                    phase2_unroll)
    assert surv_cap % phase2_tile == 0, (surv_cap, phase2_tile)
    f, r2p, nit, nu = strip_em(
        ga, gb, ea, eb, maf_a, maf_b, lo, hi, ok_a, ok_b, ta, tb,
        n_ind=n_ind, iter_cap=cap1, ignore_miss=ignore_miss,
        interpret=interpret, group=group, unroll=unroll)
    n = ta.shape[0]
    C = sel.shape[0]
    ff = f.transpose(0, 2, 3, 1).reshape(n * TA * TB, 4)
    r2c = jnp.take(r2p.reshape(-1), sel)
    fc = jnp.take(ff, sel, axis=0)                      # (C, 4)
    nitc = jnp.take(nit.reshape(-1), sel)               # (C,) i32
    nuc = jnp.take(nu.reshape(-1), sel)

    live = jnp.arange(C, dtype=jnp.int32) < n_live
    unconv = jnp.logical_and(nitc == cap1, live)
    n_surv = jnp.sum(unconv.astype(jnp.int32))
    # O(C) cumsum compaction in ORIGINAL (s1, s2) order — no sort: a
    # top_k difficulty ordering costs a full 4M-row TPU sort (~200 ms,
    # r4 chip sweep), while band neighbors already share difficulty, so
    # consecutive survivors pack into reasonably homogeneous tiles.
    # Unused slots (sidx == C) gather FILL problems: uniform GLs + f0 =
    # 0.25 is an EM fixed point, converging at iteration 0 (the
    # pallas_em._prep pad contract), so pad tiles exit after one unroll.
    rank = jnp.cumsum(unconv.astype(jnp.int32)) - 1
    slot = jnp.where(jnp.logical_and(unconv, rank < surv_cap),
                     rank, surv_cap)
    sidx = jnp.full(surv_cap, C, jnp.int32).at[slot].set(
        jnp.arange(C, dtype=jnp.int32), mode="drop")

    # ---- phase B inputs, gathered from the strip tables ----
    oob = sidx >= C
    sidx0 = jnp.where(oob, 0, sidx)
    selB = jnp.take(sel, sidx0)
    tile = selB // (TA * TB)
    a_loc = (selB % (TA * TB)) // TB
    b_loc = selB % TB
    Sa, Sb = ga.shape[1], gb.shape[2]
    s1 = jnp.where(oob, Sa, jnp.take(ta, tile) * TA + a_loc)
    s2 = jnp.where(oob, Sb, jnp.take(tb, tile) * TB + b_loc)
    g1 = jnp.take(ga, s1, axis=1, mode="fill",
                  fill_value=1.0 / 3.0).transpose(0, 2, 1)  # (3, Ip, Pc)
    g2 = jnp.take(gb, s2, axis=2, mode="fill", fill_value=1.0 / 3.0)
    Ip = ga.shape[2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (Ip, surv_cap), 0)
    inc = iota < n_ind
    if ignore_miss:
        m1 = (jnp.abs(g1[0] - g1[1]) < EPSILON) \
            & (jnp.abs(g1[1] - g1[2]) < EPSILON)
        m2 = (jnp.abs(g2[0] - g2[1]) < EPSILON) \
            & (jnp.abs(g2[1] - g2[2]) < EPSILON)
        inc = jnp.logical_and(inc, jnp.logical_not(jnp.logical_or(m1,
                                                                  m2)))
        # fill problems are all-"missing" (uniform): give them one live
        # lane so they converge at iteration 0 instead of NaN-spinning
        inc = jnp.logical_or(inc, jnp.logical_and(oob[None, :],
                                                  iota == 0))
    incf = inc.astype(jnp.float32)
    # x == 0 (all-missing under ignore_miss) -> inf -> NaN freqs frozen
    # at entry, the reference's behavior (pallas_em._prep contract)
    invx = jnp.where(oob, 1.0,
                     1.0 / jnp.take(nuc, sidx0).astype(jnp.float32)
                     )[None, :]
    f0 = jnp.where(oob[None, :], 0.25,
                   jnp.take(fc, sidx0, axis=0).T.astype(jnp.float32))
    fB, itB, _, _ = _run_kernel(g1, g2, f0, incf, invx,
                                pair_tile=phase2_tile,
                                iter_cap=iter_cap - cap1,
                                interpret=interpret,
                                unroll=phase2_unroll)

    # ---- scatter-merge (fill slots carry sidx == C and drop) ----
    fc = fc.at[sidx].set(fB.T[:surv_cap], mode="drop")
    nitc = nitc.at[sidx].set(cap1 + itB[0, :surv_cap], mode="drop")

    fm = jnp.concatenate([r2c[:, None], fc], axis=1)
    if slim_im:
        assert not ignore_miss, "slim_im requires the constant-n_used mode"
        im = nitc.astype(jnp.int8)[:, None]
    else:
        idt = jnp.int16 if use_i16 else jnp.int32
        im = jnp.stack([nitc.astype(idt), nuc.astype(idt)], axis=1)
    return fm, im, n_surv


if __name__ == "__main__":
    # interpret-mode parity vs strip_em_compact (the old unit test):
    # converged-in-A rows bit-identical, survivors within the
    # cross-kernel contract
    from ngsld_tpu.kernels.pallas_strip import strip_em_compact
    from tests.test_pallas_strip import _tables

    S, I, W = 384, 8, 120
    glp, maf, lo, hi, ok, tiles, tabs = _tables(S, I, seed=13, W=W)
    Sp = len(lo)
    mafp = np.pad(maf, (0, Sp - S), constant_values=0.5)
    ta = jnp.asarray([t[0] for t in tiles], jnp.int32)
    tb = jnp.asarray([t[1] for t in tiles], jnp.int32)
    sel_rows = []
    for t, (k, j) in enumerate(tiles):
        A = (k * TA + np.arange(TA))[:, None]
        PJ = (j * TB + np.arange(TB))[None, :]
        valid = (PJ >= lo[np.minimum(A, Sp - 1)]) \
            & (PJ < hi[np.minimum(A, Sp - 1)]) & (A < S) & (PJ < S)
        a_loc, b_loc = np.nonzero(valid)
        sel_rows.append(((t * TA + a_loc) * TB + b_loc).astype(np.int32))
    sel = np.concatenate(sel_rows)
    P = len(sel)
    m = jnp.asarray(mafp)
    okj = jnp.asarray(ok)
    args = (*tabs, m, m, jnp.asarray(lo), jnp.asarray(hi), okj, okj,
            ta, tb, jnp.asarray(sel))
    fm1, im1 = strip_em_compact(*args, n_ind=I, interpret=True)
    cap1 = 10
    fm2, im2, n_surv = strip_em_twophase(
        *args, jnp.int32(P), n_ind=I, interpret=True, cap1=cap1,
        surv_cap=32768, phase2_tile=256, phase2_unroll=5)
    fm1, im1 = np.asarray(fm1)[:P], np.asarray(im1)[:P]
    fm2, im2 = np.asarray(fm2)[:P], np.asarray(im2)[:P]
    it1 = im1[:, 0].astype(np.int32)
    it2 = im2[:, 0].astype(np.int32)
    conv_a = it1 < cap1
    np.testing.assert_array_equal(fm1[conv_a], fm2[conv_a])
    d = np.abs(fm1[~conv_a] - fm2[~conv_a])
    assert np.nanmax(d) < 5e-5, np.nanmax(d)
    dd = np.abs(it1[~conv_a] - it2[~conv_a])
    assert (dd <= 1).mean() > 0.95, dd.max()
    print(f"twophase parity OK: {P} pairs, {int(n_surv)} survivors")
