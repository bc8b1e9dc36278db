"""Headline benchmark: pair-EM evaluation throughput on one chip.

Metric: per-individual EM evaluations per second — the unit of the
reference's hot loop (one (pair, individual, iteration) update of
pair_freq_iter, gen_func.cpp:1076-1119). Baseline target: 1e9/s
(BASELINE.md north-star for one TPU chip).

Workload: realistic simulated GLs (depth/error model), 512k pairs x 100
individuals, Pallas kernel, convergence-exact EM. The `detail` field
additionally carries the roofline accounting (achieved FLOP/s, fraction
of the measured fixed-iteration structural ceiling — see PERF.md for the
measurement series) and an END-TO-END run of BASELINE.json config #3
(100k sites x 100 ind, banded --max_kb_dist 100 --extend_out, binary GL
input -> TSV), best-of-2 against the reference's measured 870 s
(10 threads). Prints ONE JSON line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# flops per (pair, individual, iteration) of the EM update: Q(12) + D(12)
# + s(7) + masked newton reciprocal(5) + D*r(4) + sum(4); the per-pair
# (I-independent) tail adds <1% at I=100. See PERF.md.
FLOPS_PER_EVAL = 44
# measured structural ceiling of the same kernel with fixed iteration
# count and register-carried state (no convergence/early-exit machinery):
# 2.5e10 evals/s on this v5e (PERF.md, round 2). The gap to it is the
# price of exact per-pair nIter/freeze semantics + pipeline overheads.
EXEC_CEILING = 2.5e10


def kernel_bench():
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
    return {
        "evals_per_sec": evals_per_sec,
        "pairs_per_sec": P / dt,
        "n_pairs": P, "n_ind": I,
        "mean_iters": float(iters.mean()),
        "backend": jax.default_backend(),
        "kernel": "pallas-sorted" if on_tpu else "xla",
        "ms_per_block": dt * 1e3,
        "achieved_tflops": evals_per_sec * FLOPS_PER_EVAL / 1e12,
        "exec_ceiling_evals_per_sec": EXEC_CEILING,
        "frac_of_exec_ceiling": evals_per_sec / EXEC_CEILING,
    }


def e2e_bench():
    """BASELINE.json config #3 end-to-end through the CLI (subprocess, as
    a user would run it): 100k x 100, --max_kb_dist 100 --extend_out."""
    import jax
    if jax.default_backend() != "tpu":
        return {"skipped": "no TPU"}
    fixdir = "/tmp/ngsld_bench_fix_100k"
    glf = os.path.join(fixdir, "sim.glf")
    pos = os.path.join(fixdir, "sim.pos")
    if not (os.path.exists(glf) and os.path.exists(pos)):
        from ngsld_tpu.utils.simulate import simulate, write_glf_bin, \
            write_pos
        os.makedirs(fixdir, exist_ok=True)
        sim = simulate(n_ind=100, n_sites=100_000, seed=17, contig_kb=500.0)
        write_glf_bin(sim, glf)
        write_pos(sim, pos)
    out = "/tmp/ngsld_bench_e2e.ld"
    cmd = [sys.executable, "-m", "ngsld_tpu.cli", "--geno", glf,
           "--log_scale", "--n_ind", "100", "--n_sites", "100000",
           "--pos", pos, "--max_kb_dist", "100", "--extend_out",
           "--engine", "jax", "--out", out, "--verbose", "0"]
    best = float("inf")
    rows = 0
    for _ in range(2):   # best-of-2: tunnel stall lottery (see PERF.md)
        t0 = time.perf_counter()
        r = subprocess.run(cmd, capture_output=True)
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            return {"error": r.stderr.decode()[-300:]}
        best = min(best, dt)
    with open(out, "rb") as fh:
        rows = sum(chunk.count(b"\n")
                   for chunk in iter(lambda: fh.read(1 << 20), b"")) - 1
    return {
        "config": "100k x 100, --max_kb_dist 100 --extend_out (binary GL)",
        "wall_s": best,
        "rows": rows,
        "pairs_per_sec": rows / best,
        "ref_seconds_10threads": 870.0,
        "speedup_vs_reference": 870.0 / best,
    }


def main():
    detail = kernel_bench()
    detail["e2e"] = e2e_bench()
    evals_per_sec = detail.pop("evals_per_sec")
    print(json.dumps({
        "metric": "pair_em_evals_per_sec",
        "value": evals_per_sec,
        "unit": "pair*ind*iter/s",
        "vs_baseline": evals_per_sec / 1e9,
        "detail": detail,
    }))


if __name__ == "__main__":
    sys.exit(main())
