"""Headline benchmark: pair-EM evaluation throughput on one chip.

Metric: per-individual EM evaluations per second — the unit of the
reference's hot loop (one (pair, individual, iteration) update of
pair_freq_iter, gen_func.cpp:1076-1119). Baseline target: 1e9/s
(BASELINE.md north-star for one TPU chip).

Workload: realistic simulated GLs (depth/error model), 512k pairs x 100
individuals, Pallas kernel, convergence-exact EM. Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ngsld_tpu.kernels.pallas_em import pair_em_sorted
    from ngsld_tpu.ops.em import pair_em
    from ngsld_tpu.utils.simulate import simulate

    P, I = 1 << 19, 100
    sim = simulate(n_ind=I, n_sites=60000, seed=0)
    gl = (sim.gl / sim.gl.sum(axis=2, keepdims=True)).astype(np.float32)
    rng = np.random.default_rng(1)
    i1, i2 = rng.integers(0, len(gl), P), rng.integers(0, len(gl), P)
    eg = gl[..., 1] + 2 * gl[..., 2]
    maf = (eg.mean(axis=1) / 2).astype(np.float32)
    args = (jnp.asarray(gl[i1]), jnp.asarray(gl[i2]),
            jnp.asarray(maf[i1]), jnp.asarray(maf[i2]))

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # difficulty-sorted two-phase kernel: bit-identical results to the
        # plain tile kernel, ~20% faster on the heavy-tailed iteration mix.
        # nIter <= 100 rides home as uint8 — the host link is the scarce
        # resource on tunneled dev chips.
        @jax.jit
        def fn(a, b, c, d):
            f, n_iter, n_used = pair_em_sorted(a, b, c, d, False,
                                               pair_tile=256, cap1=16)
            return f, n_iter.astype(jnp.uint8), n_used
    else:
        fn = jax.jit(lambda a, b, c, d: pair_em(a, b, c, d, False))

    # warmup/compile; sync via host transfer (async dispatch otherwise)
    out = fn(*args)
    _ = np.asarray(out[1])
    # best-of-N: the chip may be shared (tunneled dev setups); the fastest
    # rep reflects the kernel, the mean reflects the neighbors
    reps, dt = 5, float("inf")
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        host_iters = np.asarray(out[1])
        dt = min(dt, time.perf_counter() - t0)

    iters = host_iters.astype(np.int64) + 1
    evals_per_sec = float(iters.sum()) * I / dt
    print(json.dumps({
        "metric": "pair_em_evals_per_sec",
        "value": evals_per_sec,
        "unit": "pair*ind*iter/s",
        "vs_baseline": evals_per_sec / 1e9,
        "detail": {
            "pairs_per_sec": P / dt,
            "n_pairs": P, "n_ind": I,
            "mean_iters": float(iters.mean()),
            "backend": jax.default_backend(),
            "kernel": "pallas-sorted" if on_tpu else "xla",
            "ms_per_block": dt * 1e3,
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
