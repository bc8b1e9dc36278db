"""Single-phase strip tuning on chip (r4): first_check schedules x group,
and fused sel-compaction variants (the 108 ms take is ~18% of the leg).
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
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{label:46s} FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        dt = min(dt, time.perf_counter() - t0)
    print(f"{label:46s} {dt*1e3:7.1f} ms", flush=True)
    return out


# ---- kernel-only schedule sweep ----
counted = None
ref_nit = None
for G, U1, U2 in ((2, None, 10), (2, 20, 4), (2, 30, 10), (2, 16, 2),
                  (1, None, 10), (1, 20, 4), (1, 30, 10),
                  (4, 20, 4)):
    def run(g=G, u1=U1, u2=U2):
        return ps.strip_em(*args, n_ind=I, group=g, unroll=u2,
                           first_check=u1)
    out = t(f"kernel G={G} U1={U1} U2={U2}", run)
    if out is not None and counted is None:
        nitc = np.asarray(jnp.take(out[2].reshape(-1), sel_d))[:P]
        counted = int(nitc.astype(np.int64).sum()) + P
        ref_nit = nitc
        print(f"   counted pair-iters {counted/1e6:.1f}M", flush=True)
    elif out is not None and ref_nit is not None:
        nitc = np.asarray(jnp.take(out[2].reshape(-1), sel_d))[:P]
        eq = np.mean(np.abs(nitc - ref_nit) <= 1)
        if eq < 0.999:
            print(f"   WARNING nit +/-1 only {eq*100:.2f}%", flush=True)

# ---- compact variants (on the default kernel's output) ----
out = ps.strip_em(*args, n_ind=I)
f_t, r2p_t, nit_t, nu_t = out
n = ta_d.shape[0]


@jax.jit
def compact3(f, r2p, nit, s):
    ff = f.transpose(0, 2, 3, 1).reshape(n * TA * TB, 4)
    fm = jnp.concatenate([jnp.take(r2p.reshape(-1), s)[:, None],
                          jnp.take(ff, s, axis=0)], axis=1)
    im = jnp.take(nit.reshape(-1), s).astype(jnp.int8)[:, None]
    return fm, im


t("compact: 3 gathers (current)", lambda: compact3(f_t, r2p_t, nit_t,
                                                   sel_d))


@jax.jit
def compact1(f, r2p, nit, s):
    ff = f.transpose(0, 2, 3, 1)                       # (n, TA, TB, 4)
    X = jnp.concatenate(
        [r2p[..., None], ff,
         jax.lax.bitcast_convert_type(nit, jnp.float32)[..., None]],
        axis=-1).reshape(n * TA * TB, 6)
    Y = jnp.take(X, s, axis=0)                         # one 24 B-row take
    fm = Y[:, :5]
    im = jax.lax.bitcast_convert_type(Y[:, 5], jnp.int32) \
        .astype(jnp.int8)[:, None]
    return fm, im


t("compact: 1 gather 6-col", lambda: compact1(f_t, r2p_t, nit_t, sel_d))


@jax.jit
def compact1w(f, r2p, nit, s):
    ff = f.transpose(0, 2, 3, 1)
    z = jnp.zeros_like(r2p)[..., None]
    X = jnp.concatenate(
        [r2p[..., None], ff,
         jax.lax.bitcast_convert_type(nit, jnp.float32)[..., None],
         z, z], axis=-1).reshape(n * TA * TB, 8)
    Y = jnp.take(X, s, axis=0)                         # 32 B rows
    fm = Y[:, :5]
    im = jax.lax.bitcast_convert_type(Y[:, 5], jnp.int32) \
        .astype(jnp.int8)[:, None]
    return fm, im


t("compact: 1 gather 8-col padded", lambda: compact1w(f_t, r2p_t, nit_t,
                                                      sel_d))
print("done", flush=True)
