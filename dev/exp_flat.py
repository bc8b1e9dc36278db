"""Chip A/B (r5): strip emission — compacted sel gather vs flat cell-major.

Bench workload (256 tiles, W=4096 band, I=100, ~4.07M live pairs).
Measures, best-of-5 each:
  raw     strip_em only (block_until_ready)           — kernel floor
  compact strip_em_compact + counted-evals scalar     — r4 default
  flat    strip_em_flat (transpose+concat epilogue)   — r5 candidate
Counted evals come from one nit pull outside the timed reps.

NOTE: timings here sync via jax.block_until_ready, which one degraded
tunnel session silently turned into a no-op (bench.py now syncs every
timed rep with a scalar host pull instead and rejects implausible
times). The numbers recorded in PERF.md r5 from this harness are
corroborated by the scalar-pull compact leg (513.7 ms) minus the known
take() cost, and by bench run artifacts from healthy sessions.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _sim_tables, _wait_device  # noqa: E402
import ngsld_tpu.kernels.pallas_strip as ps  # noqa: E402

err = _wait_device(28800.0)
if err is not None:
    print("device init failed:", err, flush=True)
    sys.exit(1)
print("backend:", jax.default_backend(), flush=True)

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/ngsld_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
except Exception:
    pass

TA, TB = ps.TA, ps.TB
S, I, W = 8192, 100, 4096
gl, eg, maf = _sim_tables(S, I)
ga, gb, ea, eb = jax.jit(lambda g, e: ps.strip_tables(g, e, I))(
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
print(f"P={P} util={P/(len(tiles)*TA*TB):.3f}", flush=True)
Cq = 1 << int(np.ceil(np.log2(P)))
sel_pad = np.zeros(Cq, np.int32)
sel_pad[:P] = sel

base = (jnp.asarray(maf), jnp.asarray(maf), jnp.asarray(lo),
        jnp.asarray(hi), jnp.asarray(ok), jnp.asarray(ok),
        jnp.asarray(ta), jnp.asarray(tb))
sel_d = jnp.asarray(sel_pad)
FC = 30


@jax.jit
def f_raw(ga_, gb_, ea_, eb_):
    return ps.strip_em(ga_, gb_, ea_, eb_, *base, n_ind=I,
                       first_check=FC)


@jax.jit
def f_compact(ga_, gb_, ea_, eb_, sd):
    fm, im = ps.strip_em_compact(ga_, gb_, ea_, eb_, *base, sd, n_ind=I,
                                 slim_im=True, first_check=FC)
    return jnp.sum(im[:P, 0].astype(jnp.int32) + 1), fm, im


@jax.jit
def f_flat(ga_, gb_, ea_, eb_):
    return ps.strip_em_flat(ga_, gb_, ea_, eb_, *base, n_ind=I,
                            slim_im=True, first_check=FC)


def timeit(name, fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        dt = min(dt, time.perf_counter() - t0)
    print(f"{name:10s} {dt*1e3:8.1f} ms", flush=True)
    return dt, out


dt_raw, out_raw = timeit("raw", lambda: f_raw(ga, gb, ea, eb))
nit = np.asarray(out_raw[2]).reshape(-1)
counted = int((nit.astype(np.int64) + 1)[sel].sum())
print(f"counted pair-iters: {counted} mean {counted/P:.2f}", flush=True)

dt_c, out_c = timeit("compact", lambda: f_compact(ga, gb, ea, eb, sel_d))
assert int(out_c[0]) == counted, (int(out_c[0]), counted)
dt_f, out_f = timeit("flat", lambda: f_flat(ga, gb, ea, eb))
im_f = np.asarray(out_f[1]).reshape(-1)
c2 = int((im_f[sel].astype(np.int64) + 1).sum())
assert c2 == counted, (c2, counted)

for name, dt in (("raw", dt_raw), ("compact", dt_c), ("flat", dt_f)):
    print(f"{name:10s} {counted*I/dt:.3e} counted evals/s", flush=True)
