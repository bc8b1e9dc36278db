"""Cached device compute-fn builders for the block engine.

Three sweep kernels, each optionally shard_map'ed over a device mesh:
  * _compute_block_fn      — gathered-pair step, 1-D 'pairs' mesh
  * _compute_block_ind_fn  — gathered-pair step, 2-D ('pairs','ind') mesh
  * _strip_compute_fn      — strip-tile chunk + on-device sel compaction
"""

from __future__ import annotations

import functools


def _imat(n_iter, n_used, ignore_miss_data: bool, n_ind: int):
    """Pack the per-pair int metadata for the host pull.

    With --ignore_miss_data off, EVERY pair uses all n_ind individuals
    (ops/em.py include mask == ones; the Pallas kernels' inclusion test
    is just rows < I), so n_used is a constant the host synthesizes and
    n_iter (<= ITER_MAX == 100, gen_func.hpp:18) ships as one int8 —
    (P, 1) i8 instead of (P, 2) i16, 3 fewer bytes of the 24 B/pair on
    the host link. engine_block.fmt rebuilds the 2-column layout from
    im.shape[1]."""
    import jax.numpy as jnp
    if not ignore_miss_data:
        return n_iter.astype(jnp.int8)[:, None]
    idt = jnp.int16 if n_ind <= 32767 else jnp.int32
    return jnp.stack([n_iter.astype(idt), n_used.astype(idt)], axis=1)


@functools.lru_cache(maxsize=None)
def _compute_block_ind_fn(ignore_miss_data: bool, n_shards: int,
                          n_ind_shards: int):
    """Block step over a 2-D ('pairs', 'ind') mesh for cohorts whose
    per-pair EM should split the INDIVIDUAL axis across devices
    (--shard_ind): each per-individual reduction becomes a psum over ICI
    (parallel.sweep.sweep_step). The gathers run under GSPMD (tables
    'ind'-sharded, index vectors 'pairs'-sharded); only (r2p, f) + int16
    metadata return to the host, like the 1-D path."""
    import jax
    import jax.numpy as jnp
    from .parallel.mesh import make_mesh
    from .parallel.sweep import sweep_step
    mesh = make_mesh(n_shards, n_ind_shards,
                     devices=jax.devices()[:n_shards * n_ind_shards])
    step = sweep_step(mesh, ignore_miss_data, extend_out=True)

    def compute(gn, eg, maf, sidx):
        # sidx (2, P): both index vectors ride ONE host->device transfer
        # (each small upload pays a full tunnel round-trip)
        s1, s2 = sidx[0], sidx[1]
        gn1, gn2 = jnp.take(gn, s1, axis=0), jnp.take(gn, s2, axis=0)
        eg1, eg2 = jnp.take(eg, s1, axis=0), jnp.take(eg, s2, axis=0)
        maf1, maf2 = jnp.take(maf, s1), jnp.take(maf, s2)
        r2p, f, n_iter, n_used, *_rest = step(gn1, gn2, eg1, eg2,
                                              maf1, maf2)
        fmat = jnp.concatenate([r2p[:, None].astype(f.dtype), f], axis=1)
        imat = _imat(n_iter, n_used, ignore_miss_data, gn.shape[1])
        return fmat, imat

    return jax.jit(compute), mesh


@functools.lru_cache(maxsize=None)
def _compute_block_fn(ignore_miss_data: bool, use_pallas: bool,
                      n_shards: int = 1):
    """Device-resident block step: the GL/E[G]/MAF tables stay on device and
    the per-block pair GATHER happens there too — only the (s1, s2) index
    vectors cross the host link per block (the host<->device link is the
    scarcest resource: a tunneled TPU here measures ~15 MB/s).

    The device returns only (r2p, hap_freqs) + (n_iter, n_used): every
    other column (D, D', r2, hap MAFs, chi2) is a pure function of the
    frequencies and derives on the host (_stats_host/_chi2_host mirror the
    device formulas op-for-op in the same dtype), halving the per-pair
    result bytes.

    With n_shards > 1 the same step runs shard_map'ed over a 1-D 'pairs'
    mesh: tables replicated, index vectors (and therefore the gather and
    the EM) split across devices — the TPU-native replacement for the
    reference's pthread pool (ngsLD.cpp:154-186)."""
    import jax
    import jax.numpy as jnp
    from .ops.em import pair_em
    from .ops.stats import pearson_r2

    def compute(gn, eg, maf, sidx):
        # sidx (2, P): one fused index upload per block (see above)
        s1, s2 = sidx[0], sidx[1]
        gn1, gn2 = jnp.take(gn, s1, axis=0), jnp.take(gn, s2, axis=0)
        eg1, eg2 = jnp.take(eg, s1, axis=0), jnp.take(eg, s2, axis=0)
        maf1, maf2 = jnp.take(maf, s1), jnp.take(maf, s2)
        r2p = pearson_r2(eg1, eg2)
        if use_pallas:
            from .kernels.pallas_em import (pair_em_ichunk,
                                            pair_em_rows_from_gl,
                                            pair_em_sorted, pick_ichunk,
                                            pick_pair_tile, pick_rows_tile)
            pt = pick_pair_tile(gn1.shape[1])
            ptr = pick_rows_tile(gn1.shape[1]) if pt is None else None
            if pt is not None:
                f, n_iter, n_used = pair_em_sorted(
                    gn1, gn2, maf1, maf2, ignore_miss_data, pair_tile=pt)
            elif ptr is not None:
                # large cohort: the row-layout kernel (pairs on sublanes)
                # still fits VMEM up to ~8k individuals
                f, n_iter, n_used = pair_em_rows_from_gl(
                    gn1, gn2, maf1, maf2, ignore_miss_data, pair_tile=ptr)
            else:
                # HUGE cohort: the streamed kernel keeps only double
                # buffers in VMEM and DMAs the GL rows per I-chunk —
                # n_ind is unbounded, like the reference's
                # pair_freq_iter (gen_func.cpp:1076-1119)
                ipt, ic = pick_ichunk(gn1.shape[1])
                f, n_iter, n_used = pair_em_ichunk(
                    gn1, gn2, maf1, maf2, ignore_miss_data,
                    pair_tile=ipt, i_chunk=ic)
        else:
            f, n_iter, n_used = pair_em(gn1, gn2, maf1, maf2, ignore_miss_data)
        fmat = jnp.concatenate([r2p[:, None].astype(f.dtype), f],
                               axis=1)  # (P, 5)
        imat = _imat(n_iter, n_used, ignore_miss_data, gn.shape[1])
        return fmat, imat

    if n_shards > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as PS

        from .parallel.mesh import make_mesh
        mesh = make_mesh(n_shards, 1, devices=jax.devices()[:n_shards])
        rep, shd = PS(), PS("pairs")
        compute = shard_map(
            compute, mesh=mesh,
            in_specs=(rep, rep, rep, PS(None, "pairs")),
            out_specs=(shd, shd), check_vma=False)
    return jax.jit(compute)


@functools.lru_cache(maxsize=None)
def _strip_flat_fn(n_ind: int, ignore_miss: bool, interpret: bool,
                   use_i16: bool, first_check: int | None = None):
    """Flat cell-major strip compute (single device): the kernel's tile
    outputs relayout to dense (cells, 5)/(cells, k) rows with NO device
    gather; the host applies the chunk's sel permutation during the pull
    stage (engine_block). Picked for near-full-utilization chunks where
    the sel take()s were pure reordering at gather speed (PERF.md r4)."""
    import jax
    from .kernels.pallas_strip import strip_em_flat
    return jax.jit(functools.partial(
        strip_em_flat, n_ind=n_ind, ignore_miss=ignore_miss,
        interpret=interpret, use_i16=use_i16, slim_im=not ignore_miss,
        first_check=first_check))


@functools.lru_cache(maxsize=None)
def _strip_compute_fn(n_shards: int, n_ind: int, ignore_miss: bool,
                      interpret: bool, use_i16: bool,
                      first_check: int | None = None):
    """Strip-chunk compute for the block engine: the per-tile Pallas
    kernel shard_map'ed over the 'pairs' mesh (each device runs its slice
    of the chunk's tile list; tables replicated — same topology as the
    gather path's shard_map), then the on-device sel compaction as a
    global op. n_shards == 1 is the plain single-device jit."""
    import jax
    import jax.numpy as jnp
    from .kernels.pallas_strip import TA, TB, strip_em, strip_em_compact

    if n_shards == 1:
        return jax.jit(functools.partial(
            strip_em_compact, n_ind=n_ind, ignore_miss=ignore_miss,
            interpret=interpret, use_i16=use_i16,
            slim_im=not ignore_miss, first_check=first_check))

    from jax import shard_map
    from jax.sharding import PartitionSpec as PS

    from .parallel.mesh import make_mesh
    mesh = make_mesh(n_shards, 1, devices=jax.devices()[:n_shards])
    rep, shd = PS(), PS("pairs")

    def tiles(ga, gb, ea, eb, mafa, mafb, lo, hi, oka, okb, ta, tb):
        return strip_em(ga, gb, ea, eb, mafa, mafb, lo, hi, oka, okb,
                        ta, tb, n_ind=n_ind, ignore_miss=ignore_miss,
                        interpret=interpret, first_check=first_check)

    sharded = shard_map(
        tiles, mesh=mesh,
        in_specs=(rep,) * 10 + (shd, shd),
        out_specs=(shd, shd, shd, shd), check_vma=False)

    def compute(ga, gb, ea, eb, mafa, mafb, lo, hi, oka, okb, ta, tb,
                sel):
        f, r2p, nit, nu = sharded(ga, gb, ea, eb, mafa, mafb, lo, hi,
                                  oka, okb, ta, tb)
        n = ta.shape[0]
        ff = f.transpose(0, 2, 3, 1).reshape(n * TA * TB, 4)
        fm = jnp.concatenate([jnp.take(r2p.reshape(-1), sel)[:, None],
                              jnp.take(ff, sel, axis=0)], axis=1)
        if not ignore_miss:
            im = jnp.take(nit.reshape(-1), sel).astype(jnp.int8)[:, None]
        else:
            idt = jnp.int16 if use_i16 else jnp.int32
            im = jnp.stack([jnp.take(nit.reshape(-1), sel).astype(idt),
                            jnp.take(nu.reshape(-1), sel).astype(idt)],
                           axis=1)
        return fm, im

    return jax.jit(compute)


