"""Strip-kernel tuning sweep on the real chip (session experiment).

Sweeps anchor group size and unroll over the bench workload shape
(S=8192, I=100, W=4096, 256-tile chunk) and prints evals/s per config.
One process, one device attach; best-of-3 per config.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _sim_tables  # noqa: E402
from ngsld_tpu.kernels.pallas_strip import (TA, TB, strip_em_compact,
                                            strip_tables)  # noqa: E402

from bench import _wait_device  # noqa: E402
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
print(f"P={P} tiles={len(tiles)}", flush=True)

maf_d, lo_d, hi_d, ok_d = (jnp.asarray(maf), jnp.asarray(lo),
                           jnp.asarray(hi), jnp.asarray(ok))
ta_d, tb_d = jnp.asarray(ta), jnp.asarray(tb)

ref_im = None
for group in (4, 8, 16, 2):
    for unroll in (4, 10):
        label = f"group={group} unroll={unroll}"
        try:
            @jax.jit
            def fn(sel_x, g=group, u=unroll):
                fm, im = strip_em_compact(
                    ga, gb, ea, eb, maf_d, maf_d, lo_d, hi_d, ok_d, ok_d,
                    ta_d, tb_d, sel_x, n_ind=I, group=g, unroll=u)
                return jnp.sum(im[:P, 0].astype(jnp.int32) + 1), fm, im
            t0 = time.perf_counter()
            out = fn(sel_d)
            total = int(out[0])
            tc = time.perf_counter() - t0
        except Exception as e:
            print(f"{label}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        im_np = np.asarray(out[2][:P])
        if ref_im is None:
            ref_im = im_np
            eq = "ref"
        else:
            eq = "MATCH" if np.array_equal(ref_im, im_np) else "DIFF"
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(sel_d)
            total = int(out[0])
            dt = min(dt, time.perf_counter() - t0)
        ev = total * I / dt
        print(f"{label}: {ev:.3e} evals/s  ms={dt*1e3:.1f} "
              f"compile+first={tc:.1f}s iters/pair={total/P:.1f} nit:{eq}",
              flush=True)
print("done", flush=True)


# ---- TB=256 leg: wider partner tiles (fewer scalar syncs per pair) ----
def tb_leg(tb_val):
    import ngsld_tpu.kernels.pallas_strip as ps
    old_tb = ps.TB
    ps.TB = tb_val
    try:
        ga2, gb2, ea2, eb2 = jax.jit(
            lambda g, e: ps.strip_tables(g, e, I))(jnp.asarray(gl),
                                                   jnp.asarray(eg))
        tiles2 = [(k, j) for k in range(S // ps.TA)
                  for j in range(k * ps.TA // tb_val,
                                 min(S // tb_val,
                                     (k * ps.TA + W) // tb_val + 1))][:256]
        ta2 = np.array([t[0] for t in tiles2], np.int32)
        tb2 = np.array([t[1] for t in tiles2], np.int32)
        sels2 = []
        for slot, (k, j) in enumerate(tiles2):
            A = (k * ps.TA + np.arange(ps.TA))[:, None]
            PJ = (j * tb_val + np.arange(tb_val))[None, :]
            valid = (PJ > A) & (PJ < hi[np.minimum(A, S - 1)]) & (PJ < S)
            a_loc, b_loc = np.nonzero(valid)
            sels2.append(((slot * ps.TA + a_loc) * tb_val
                          + b_loc).astype(np.int32))
        sel2 = np.concatenate(sels2)
        P2 = len(sel2)
        Cq2 = 1 << int(np.ceil(np.log2(max(P2, 1))))
        sp2 = np.zeros(Cq2, np.int32)
        sp2[:P2] = sel2
        sel2_d = jnp.asarray(sp2)

        grp = max(1, (4 * 128) // tb_val)   # keep G*Ip*TB VMEM constant

        @jax.jit
        def fn2(sx):
            fm, im = ps.strip_em_compact(
                ga2, gb2, ea2, eb2, maf_d, maf_d, lo_d, hi_d, ok_d, ok_d,
                jnp.asarray(ta2), jnp.asarray(tb2), sx, n_ind=I, group=grp)
            return jnp.sum(im[:P2, 0].astype(jnp.int32) + 1), fm, im

        t0 = time.perf_counter()
        out = fn2(sel2_d)
        total = int(out[0])
        tc = time.perf_counter() - t0
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn2(sel2_d)
            total = int(out[0])
            dt = min(dt, time.perf_counter() - t0)
        ev = total * I / dt
        print(f"TB={tb_val}: {ev:.3e} evals/s ms={dt*1e3:.1f} P={P2} "
              f"iters/pair={total/P2:.2f} compile={tc:.1f}s", flush=True)
    except Exception as e:
        print(f"TB={tb_val}: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)
    finally:
        ps.TB = old_tb


for tbv in (256, 512):
    tb_leg(tbv)
print("done2", flush=True)


# ---- streamed strip leg: n_ind=20k through _strip_ichunk_kernel ----
def streamed_leg():
    import ngsld_tpu.kernels.pallas_strip as ps
    I2 = 20000
    S2 = 1024
    reps_needed = -(-I2 // I)
    gl_big = np.tile(gl[:S2], (1, reps_needed, 1))[:, :I2]
    eg_big = gl_big[..., 1] + 2 * gl_big[..., 2]
    maf2 = (eg_big.mean(axis=1) / 2).astype(np.float32)
    try:
        assert ps.strip_streamed(I2), "20k must stream"
        tabs = jax.jit(lambda g, e: ps.strip_tables(
            g, e, I2, i_align=ps.strip_i_align(I2)))(
                jnp.asarray(gl_big.astype(np.float32)),
                jnp.asarray(eg_big.astype(np.float32)))
        hi2 = np.full(S2, S2, np.int32)          # all-pairs band
        lo2 = np.arange(S2, dtype=np.int32) + 1
        ok2 = np.ones(S2, np.float32)
        tiles2 = [(k, j) for k in range(S2 // ps.TA)
                  for j in range(k, S2 // ps.TB)]
        ta2 = jnp.asarray([t[0] for t in tiles2], jnp.int32)
        tb2 = jnp.asarray([t[1] for t in tiles2], jnp.int32)
        m2 = jnp.asarray(maf2)

        @jax.jit
        def fn(m):
            f, r2p, nit, nu = ps.strip_em(
                *tabs, m, m, jnp.asarray(lo2), jnp.asarray(hi2),
                jnp.asarray(ok2), jnp.asarray(ok2), ta2, tb2, n_ind=I2)
            return jnp.sum(jnp.where(nit < 100, nit + 1, 0)), nit

        t0 = time.perf_counter()
        out = fn(m2)
        total = int(out[0])
        tc = time.perf_counter() - t0
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(m2)
            total = int(out[0])
            dt = min(dt, time.perf_counter() - t0)
        # counted LIVE evals: converged pairs' iters (unconverged add cap)
        nit = np.asarray(out[1])
        live = nit < 100
        iters = nit[live].astype(np.int64) + 1
        P3 = int(live.sum())
        ev = (iters.sum()) * I2 / dt
        print(f"streamed-strip n_ind=20k: {ev:.3e} evals/s ms={dt*1e3:.0f}"
              f" live_pairs={P3} mean_iters={iters.mean():.1f}"
              f" compile={tc:.1f}s", flush=True)
    except Exception as e:
        print(f"streamed-strip: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)


streamed_leg()
print("done3", flush=True)
