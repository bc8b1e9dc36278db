"""Decompose two-phase strip cost on the chip (r4)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _sim_tables, _wait_device  # noqa: E402
import ngsld_tpu.kernels.pallas_strip as ps  # noqa: E402
from ngsld_tpu.kernels.pallas_em import _run_kernel  # noqa: E402

err = _wait_device(28800.0)
if err is not None:
    print("device init failed:", err, flush=True)
    sys.exit(1)
print("backend:", jax.default_backend(), flush=True)

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
Cq = 1 << int(np.ceil(np.log2(max(P, 1))))
sel_pad = np.zeros(Cq, np.int32)
sel_pad[:P] = sel
sel_d = jnp.asarray(sel_pad)
maf_d, lo_d, hi_d, ok_d = (jnp.asarray(maf), jnp.asarray(lo),
                           jnp.asarray(hi), jnp.asarray(ok))
ta_d, tb_d = jnp.asarray(ta), jnp.asarray(tb)
args = (ga, gb, ea, eb, maf_d, maf_d, lo_d, hi_d, ok_d, ok_d, ta_d, tb_d)


def t(label, fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        dt = min(dt, time.perf_counter() - t0)
    print(f"{label:42s} {dt*1e3:7.1f} ms", flush=True)
    return out


# phase A kernel only (no compact) at cap1=30 and at full 100
fA = jax.jit(lambda: ps.strip_em(*args, n_ind=I, iter_cap=30))
t("strip_em cap=30 (kernel only)", fA)
f100 = jax.jit(lambda: ps.strip_em(*args, n_ind=I, iter_cap=100))
t("strip_em cap=100 (kernel only)", f100)

# compaction alone
out30 = fA()


@jax.jit
def compact(f, r2p, nit, nu, s):
    n = ta_d.shape[0]
    ff = f.transpose(0, 2, 3, 1).reshape(n * TA * TB, 4)
    fm = jnp.concatenate([jnp.take(r2p.reshape(-1), s)[:, None],
                          jnp.take(ff, s, axis=0)], axis=1)
    im = jnp.take(nit.reshape(-1), s).astype(jnp.int8)[:, None]
    return fm, im


t("compact (take fm/im)", lambda: compact(*out30, sel_d))

# single-phase full (kernel + compact)
from ngsld_tpu.kernels.pallas_strip import strip_em_compact, \
    strip_em_twophase  # noqa: E402
t("single-phase compact cap=100", lambda: strip_em_compact(
    *args, sel_d, n_ind=I, slim_im=True))

# two-phase full
t("two-phase cap1=30", lambda: strip_em_twophase(
    *args, sel_d, jnp.int32(P), n_ind=I, slim_im=True, cap1=30,
    surv_cap=Cq // 4, phase2_tile=256, phase2_unroll=5))

# phase B alone on a 1.05M survivor load sourced from the tables
SC = Cq // 4
rng = np.random.default_rng(0)
s1f = jnp.asarray(rng.integers(0, S, SC).astype(np.int32))
s2f = jnp.asarray(rng.integers(0, S, SC).astype(np.int32))
m1 = jnp.take(maf_d, s1f)
m2 = jnp.take(maf_d, s2f)


@jax.jit
def phaseB():
    g1 = jnp.take(ga, s1f, axis=1).transpose(0, 2, 1)
    g2 = jnp.take(gb, s2f, axis=2)
    Ip = ga.shape[2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (Ip, SC), 0)
    incf = (iota < I).astype(jnp.float32)
    invx = jnp.full((1, SC), 1.0 / I, jnp.float32)
    f0 = jnp.stack([(1 - m1) * (1 - m2), (1 - m1) * m2,
                    m1 * (1 - m2), m1 * m2], axis=0)
    return _run_kernel(g1, g2, f0, incf, invx, pair_tile=256,
                       iter_cap=70, interpret=False, unroll=5)


t("phase B style: gather+layout+kernel 1.05M", phaseB)


@jax.jit
def gathers_only():
    g1 = jnp.take(ga, s1f, axis=1).transpose(0, 2, 1)
    g2 = jnp.take(gb, s2f, axis=2)
    return g1, g2


t("phase B gathers+transpose only", gathers_only)
print("done", flush=True)
