"""Round-4 strip-kernel tuning sweep #2 (session experiment).

Round-4 sweep #1 pinned group=2/unroll=10 at 1.35e10 evals/s (vs 9.2e9
at the old group=4 default). The remaining gap to the 2.5e10 structural
ceiling is executed-vs-counted iteration waste: a group's while loop
runs to the max nIter over its G*TB lanes. This sweep probes finer
convergence granularity (group=1) and deeper unrolls, plus TB=256 with
the harness reshape fixed (sweep #1's TB leg had a stale-TB bug).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _sim_tables, _wait_device  # noqa: E402

err = _wait_device(3600.0)
if err is not None:
    print("device init failed:", err, flush=True)
    sys.exit(1)
print("backend:", jax.default_backend(), flush=True)

import ngsld_tpu.kernels.pallas_strip as ps  # noqa: E402

S, I, W = 8192, 100, 4096
gl, eg, maf = _sim_tables(S, I)
hi = np.minimum(np.arange(S) + W, S).astype(np.int32)
lo = np.arange(S, dtype=np.int32) + 1
ok = np.ones(S, np.float32)


def leg(tb_val, group, unroll, reps=3):
    """One (TB, group, unroll) config through strip_em_compact."""
    old_tb = ps.TB
    ps.TB = tb_val
    try:
        tabs = jax.jit(lambda g, e: ps.strip_tables(g, e, I))(
            jnp.asarray(gl), jnp.asarray(eg))
        tiles = [(k, j) for k in range(S // ps.TA)
                 for j in range(k * ps.TA // tb_val,
                                min(S // tb_val,
                                    (k * ps.TA + W) // tb_val + 1))]
        tiles = tiles[:256 * 128 // tb_val]   # ~constant pair budget
        ta = np.array([t[0] for t in tiles], np.int32)
        tb = np.array([t[1] for t in tiles], np.int32)
        sels = []
        for slot, (k, j) in enumerate(tiles):
            A = (k * ps.TA + np.arange(ps.TA))[:, None]
            PJ = (j * tb_val + np.arange(tb_val))[None, :]
            valid = (PJ > A) & (PJ < hi[np.minimum(A, S - 1)]) & (PJ < S)
            a_loc, b_loc = np.nonzero(valid)
            sels.append(((slot * ps.TA + a_loc) * tb_val
                         + b_loc).astype(np.int32))
        sel = np.concatenate(sels)
        P = len(sel)
        Cq = 1 << int(np.ceil(np.log2(max(P, 1))))
        sp = np.zeros(Cq, np.int32)
        sp[:P] = sel
        sel_d = jnp.asarray(sp)
        md, lod, hid, okd = (jnp.asarray(maf), jnp.asarray(lo),
                             jnp.asarray(hi), jnp.asarray(ok))
        tad, tbd = jnp.asarray(ta), jnp.asarray(tb)

        @jax.jit
        def fn(t0_, t1_, t2_, t3_, sx):
            fm, im = ps.strip_em_compact(
                t0_, t1_, t2_, t3_, md, md, lod, hid, okd, okd,
                tad, tbd, sx, n_ind=I, group=group, unroll=unroll)
            return jnp.sum(im[:P, 0].astype(jnp.int32) + 1), im

        t0 = time.perf_counter()
        out = fn(*tabs, sel_d)
        total = int(out[0])
        tc = time.perf_counter() - t0
        dt = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*tabs, sel_d)
            total = int(out[0])
            dt = min(dt, time.perf_counter() - t0)
        ev = total * I / dt
        print(f"TB={tb_val} group={group} unroll={unroll}: {ev:.3e} "
              f"evals/s ms={dt*1e3:.1f} P={P} iters/pair={total/P:.2f} "
              f"compile={tc:.1f}s", flush=True)
        return ev
    except Exception as e:
        print(f"TB={tb_val} group={group} unroll={unroll}: FAIL "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    finally:
        ps.TB = old_tb


for g, u in ((2, 10), (1, 10), (1, 20), (2, 20), (2, 4)):
    leg(128, g, u)
for g, u in ((2, 10), (1, 10)):
    leg(256, g, u)
print("done", flush=True)
