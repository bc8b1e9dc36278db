"""Pull per-pair nIter for the bench strip chunk and save it (r4).

One chip run of the default strip config; saves nit/live/plan to
/tmp/strip_nit.npz so check-schedule variants can be evaluated OFFLINE
(executed-iteration model) without burning chip time per candidate.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _sim_tables, _wait_device  # noqa: E402
from ngsld_tpu.kernels.pallas_strip import (TA, TB, strip_em_compact,
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
print(f"P={P} tiles={len(tiles)}", flush=True)

maf_d, lo_d, hi_d, ok_d = (jnp.asarray(maf), jnp.asarray(lo),
                           jnp.asarray(hi), jnp.asarray(ok))
ta_d, tb_d = jnp.asarray(ta), jnp.asarray(tb)


@jax.jit
def fn(sel_x):
    fm, im = strip_em_compact(
        ga, gb, ea, eb, maf_d, maf_d, lo_d, hi_d, ok_d, ok_d,
        ta_d, tb_d, sel_x, n_ind=I)
    return fm, im


t0 = time.perf_counter()
fm, im = fn(sel_d)
im_np = np.asarray(im[:P])
print(f"run {time.perf_counter()-t0:.1f}s", flush=True)
nit = im_np[:, 0].astype(np.int32)
np.savez("/tmp/strip_nit.npz", nit=nit, sel=sel,
         ta=ta, tb=tb, TA=TA, TB=TB, W=W, S=S, I=I)
print(f"saved: mean nIter {nit.mean()+1:.1f} max {nit.max()+1} "
      f"p50 {np.percentile(nit,50)+1:.0f} p90 {np.percentile(nit,90)+1:.0f} "
      f"p99 {np.percentile(nit,99)+1:.0f}", flush=True)
