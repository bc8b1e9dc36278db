"""JAX engine driver: the fast device path (TPU or CPU via XLA/Pallas).

Pipeline (mirrors main(), ngsLD.cpp:27-223, re-architected for a device):
  host: read GLs/positions (strict readers — exact reference semantics)
  dev:  preprocess (call_geno, MAF, normal-space GLs, E[G])   [jit]
  host: banded pair plan (vectorized, RNG-exact)              [plan.band]
  dev:  per block: pair EM + D/D'/r2/chi2 + Pearson r2        [jit or Pallas]
  host: format + emit TSV rows in deterministic (s1, s2) order

Precision: f64 on CPU (reference-grade), f32 on TPU (fast path; TPU f64 is
software-emulated). Values agree with the strict engine to ~1e-12 (f64) /
~1e-4 (f32); the strict engine remains the byte-exact contract.
"""

from __future__ import annotations

import functools
import math
import sys

import numpy as np

from . import strict
from .config import Params
from .constants import INF


def _resolve_precision(precision: str) -> str:
    import jax
    if precision != "auto":
        return precision
    return "f32" if jax.default_backend() == "tpu" else "f64"


@functools.lru_cache(maxsize=None)
def _compute_block_fn(ignore_miss_data: bool, extend_out: bool, use_pallas: bool):
    import jax
    import jax.numpy as jnp
    from .ops.em import pair_em
    from .ops.stats import chi2_stat, ld_stats, pearson_r2

    def compute(gn1, gn2, eg1, eg2, maf1, maf2):
        r2p = pearson_r2(eg1, eg2)
        if use_pallas:
            from .kernels.pallas_em import pair_em_pallas
            f, n_iter, n_used = pair_em_pallas(gn1, gn2, maf1, maf2,
                                               ignore_miss_data)
        else:
            f, n_iter, n_used = pair_em(gn1, gn2, maf1, maf2, ignore_miss_data)
        hmaf0, hmaf1, D, Dp, r2 = ld_stats(f)
        chi2 = chi2_stat(f) if extend_out else jnp.zeros_like(r2p)
        return r2p, f, n_iter, n_used, hmaf0, hmaf1, D, Dp, r2, chi2

    return jax.jit(compute)


def run_jax(pars: Params, out_fh=None) -> None:
    import jax

    prec = _resolve_precision(pars.precision)
    if prec == "f64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from .ops.preprocess import preprocess

    dt = jnp.float64 if prec == "f64" else jnp.float32

    close = False
    if out_fh is None:
        if pars.out is not None:
            out_fh = open(pars.out, "w")
            close = True
        else:
            out_fh = sys.stdout

    try:
        # ---- host: exact readers (shared with the strict engine)
        geno_log = strict.read_geno(pars.in_geno, pars.in_bin, pars.in_probs,
                                    pars.in_logscale, pars.n_ind, pars.n_sites)
        if pars.in_pos:
            pos_dist, labels = strict.read_pos(pars.in_pos, pars.in_pos_header,
                                               pars.n_sites)
        else:
            pos_dist = np.full(pars.n_sites, math.inf)
            labels = ["(null)"] * pars.n_sites

        # ---- device: preprocessing
        pre = jax.jit(functools.partial(
            preprocess, call=pars.call_geno, N_thresh=pars.N_thresh,
            call_thresh=pars.call_thresh,
            ignore_miss_data=pars.ignore_miss_data))
        gn_d, maf_d, eg_d = pre(jnp.asarray(geno_log, dt))
        gn = np.asarray(gn_d)
        maf = np.asarray(maf_d, np.float64)
        eg = np.asarray(eg_d)

        from .io.writer import RowWriter
        writer = RowWriter(out_fh, labels, pars.extend_out)
        writer.write_header()

        # ---- banded sweep in device-sized blocks
        from .plan.band import iter_pair_blocks
        use_pallas = jax.default_backend() == "tpu" and prec == "f32"
        compute = _compute_block_fn(pars.ignore_miss_data, pars.extend_out,
                                    use_pallas)
        chunk = int(pars.chunk_pairs)

        for blk in iter_pair_blocks(pars, maf, pos_dist, block_pairs=chunk):
            P = len(blk.s1)
            # pad to the fixed chunk size to keep one compiled program
            pad = chunk - P if P < chunk else 0
            s1 = np.concatenate([blk.s1, np.zeros(pad, np.int64)])
            s2 = np.concatenate([blk.s2, np.ones(pad, np.int64)
                                 * min(1, pars.n_sites - 1)])
            r2p, f, n_iter, n_used, hmaf0, hmaf1, D, Dp, r2, chi2 = [
                np.asarray(x)[:P] for x in compute(
                    jnp.asarray(gn[s1]), jnp.asarray(gn[s2]),
                    jnp.asarray(eg[s1]), jnp.asarray(eg[s2]),
                    jnp.asarray(maf[s1], dt), jnp.asarray(maf[s2], dt))]
            writer.write_block(
                blk.s1, blk.s2, blk.dist, np.float64(r2p), np.float64(D),
                np.float64(Dp), np.float64(r2), n_used=n_used,
                maf1=maf[blk.s1], maf2=maf[blk.s2], hap=np.float64(f),
                hmaf1=np.float64(hmaf0), hmaf2=np.float64(hmaf1),
                chi2=chi2, n_iter=n_iter)
    finally:
        if close:
            out_fh.close()
