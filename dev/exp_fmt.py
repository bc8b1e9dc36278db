"""Micro-benchmark of the native bulk formatter (VERDICT r3 item 4).

Measures ns/row of format_rows_derive on realistic extended rows so
fmt_f6 / emit_cols optimizations can be judged on THIS box (1 core).
"""
import time
import numpy as np

from ngsld_tpu import native

N = 2_000_000
rng = np.random.default_rng(0)

labels = [f"chrSIM_{i % 37}:{100000 + 13 * i}" for i in range(100_000)]
blob, off = native.make_labels_blob(labels)

s1 = rng.integers(0, 90_000, N).astype(np.int64)
s2 = (s1 + rng.integers(1, 9_000, N)).astype(np.int64)
dist = rng.integers(1, 100_000, N).astype(np.float64)

# hap freqs like converged EM output: mostly interior, a slab of exact
# corners (converged 0/1 prints constantly per the fmt_f6 comment)
f = rng.dirichlet((0.8, 0.8, 0.8, 0.8), N).astype(np.float32)
corner = rng.random(N) < 0.30
fc = np.zeros((N, 4), np.float32)
fc[np.arange(N), rng.integers(0, 4, N)] = 1.0
f[corner] = fc[corner]
r2p = rng.random(N).astype(np.float32)
maf1 = rng.random(N) * 0.5
maf2 = rng.random(N) * 0.5
n_used = rng.integers(1, 101, N).astype(np.int32)
n_iter = rng.integers(1, 101, N).astype(np.int32)

for extend in (True, False):
    # warm-up (alloc paths)
    native.format_rows_derive(blob, off, s1[:1000], s2[:1000], dist[:1000],
                              r2p[:1000], f[:1000], maf1[:1000], maf2[:1000],
                              n_used[:1000], n_iter[:1000], extend)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = native.format_rows_derive(blob, off, s1, s2, dist, r2p, f,
                                        maf1, maf2, n_used, n_iter, extend)
        dt = time.perf_counter() - t0
        best = min(best, dt)
    ns = best * 1e9 / N
    print(f"extend={extend}: {best:.3f}s for {N} rows = {ns:.0f} ns/row "
          f"({len(out)/1e6:.0f} MB)")
