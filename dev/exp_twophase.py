"""Two-phase strip sweep on the real chip (r4, VERDICT item 3).

Baseline single-phase strip_em_compact vs strip_em_twophase over
cap1 x phase2_unroll on the bench workload (same shape as exp_strip.py).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _sim_tables, _wait_device  # noqa: E402
from ngsld_tpu.kernels.pallas_strip import (TA, TB, strip_em_compact,
                                            strip_em_twophase,
                                            strip_tables)  # noqa: E402

err = _wait_device(28800.0)
if err is not None:
    print("device init failed:", err, flush=True)
    sys.exit(1)
print("backend:", jax.default_backend(), flush=True)

S, I, W = 8192, 100, 4096
gl, eg, maf = _sim_tables(S, I)
ga, gb, ea, eb = jax.jit(lambda g, e: strip_tables(g, e, I))(
    jnp.asarray(gl), jnp.asarray(eg))
hi = np.minimum(np.arange(S) + W, S).astype(np.int32)
lo = np.arange(S, dtype=np.int32) + 1
ok = np.ones(S, np.float32)
tiles = [(k, j) for k in range(S // TA)
         for j in range(k, min(S // TB, (k * TA + W) // TB + 1))][:256]
ta = np.array([t[0] for t in tiles], np.int32)
tb = np.array([t[1] for t in tiles], np.int32)
sels = []
for slot, (k, j) in enumerate(tiles):
    A = (k * TA + np.arange(TA))[:, None]
    PJ = (j * TB + np.arange(TB))[None, :]
    valid = (PJ > A) & (PJ < hi[np.minimum(A, S - 1)]) & (PJ < S)
    a_loc, b_loc = np.nonzero(valid)
    sels.append(((slot * TA + a_loc) * TB + b_loc).astype(np.int32))
sel = np.concatenate(sels)
P = len(sel)
Cq = 1 << int(np.ceil(np.log2(max(P, 1))))
sel_pad = np.zeros(Cq, np.int32)
sel_pad[:P] = sel
sel_d = jnp.asarray(sel_pad)
print(f"P={P} tiles={len(tiles)} Cq={Cq}", flush=True)

maf_d, lo_d, hi_d, ok_d = (jnp.asarray(maf), jnp.asarray(lo),
                           jnp.asarray(hi), jnp.asarray(ok))
ta_d, tb_d = jnp.asarray(ta), jnp.asarray(tb)
args = (ga, gb, ea, eb, maf_d, maf_d, lo_d, hi_d, ok_d, ok_d,
        ta_d, tb_d, sel_d)


def timeit(fn, reps=3):
    t0 = time.perf_counter()
    out = fn()
    tc = time.perf_counter() - t0
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        dt = min(dt, time.perf_counter() - t0)
    return out, dt, tc


# ---- baseline: single-phase ----
base = None


def run_single():
    fm, im = strip_em_compact(*args, n_ind=I, slim_im=True)
    return np.asarray(im[:P, 0]).astype(np.int32)


nit1, dt1, tc1 = timeit(run_single)
counted = int(nit1.astype(np.int64).sum() + P)   # +1 per pair convention
print(f"single-phase: {counted * I / dt1:.3e} evals/s ms={dt1*1e3:.0f} "
      f"compile={tc1:.1f}s", flush=True)

for cap1 in (24, 30, 40):
    u1 = 10 if cap1 % 10 == 0 else 8
    for p2u in (2, 5, 10):
        if (100 - cap1) % p2u or cap1 % u1:
            continue
        try:
            def run_two(c=cap1, u=p2u, uu=u1):
                fm, im, ns = strip_em_twophase(
                    *args, jnp.int32(P), n_ind=I, slim_im=True, cap1=c,
                    unroll=uu, surv_cap=Cq // 8, phase2_tile=256,
                    phase2_unroll=u)
                return (np.asarray(im[:P, 0]).astype(np.int32), int(ns))
            (nit2, ns), dt2, tc2 = timeit(run_two)
        except Exception as e:
            print(f"cap1={cap1} p2u={p2u}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        counted2 = int(nit2.astype(np.int64).sum() + P)
        agree = np.mean(np.abs(nit2 - nit1) <= 1)
        print(f"cap1={cap1} p2u={p2u}: {counted2 * I / dt2:.3e} evals/s "
              f"ms={dt2*1e3:.0f} n_surv={ns} nit+/-1 {agree*100:.2f}% "
              f"compile={tc2:.1f}s", flush=True)
print("done", flush=True)
