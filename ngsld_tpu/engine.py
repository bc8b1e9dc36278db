"""JAX engine driver: the fast device path (TPU or CPU via XLA/Pallas).

Pipeline (mirrors main(), ngsLD.cpp:27-223, re-architected for a device;
every stage below overlaps its neighbors via bounded queues/threads):
  host: binary GLs stream to the device in slabs while positions parse
        (text inputs take the native/strict readers — exact reference
        semantics); normalization happens on device (preprocess raw=True)
  dev:  preprocess (call_geno, MAF, normal-space GLs, E[G])   [jit, sharded]
  host: banded pair plan (native C++ slab enumerator, RNG-exact), produced
        on a prefetch thread                                  [plan.band]
  dev:  per block: pair EM (Pallas: column kernel, row kernel for large
        cohorts, XLA fallback) + Pearson r2; only (r2p, hap freqs) +
        int16 metadata return over the link
  host: 3-stage emit pipeline — pull (tunnel IO) -> derive stats + format
        (native C, stats computed in the formatter's worker threads) ->
        write (disk IO) — rows in deterministic (s1, s2) order

Two sharding modes: the default replicates the tables over a 1-D 'pairs'
mesh (--shard); --ring keeps them site-sharded and ring-passes partner
blocks for tables too large to replicate (multi-host: per-process shards).

Precision: f64 on CPU (reference-grade), f32 on TPU (fast path; TPU f64 is
software-emulated). Values agree with the strict engine to ~1e-12 (f64) /
~1e-4 (f32); the strict engine remains the byte-exact contract.

Aux subsystems the reference lacks (SURVEY.md §5):
  * phase timing + stage wall-time counters + EM-iteration histogram
    (--verbose 2)
  * JAX profiler traces (--profile DIR)
  * checkpoint/resume: per-block output shards + manifest (--checkpoint DIR);
    a killed run re-runs only the missing blocks
  * graceful SIGINT/SIGTERM: in-flight blocks flush, exit 130, resumable
  * activity-aware device-link keepalive for tunneled accelerators.
"""

from __future__ import annotations

import os
import sys

from . import strict
from .config import Params
from .utils.logging import RunLog, echo_config

# The drivers and their support classes live in sibling modules; the names
# below stay importable from here (tests and external monkeypatches use
# `engine._RingSpill` etc. — same class objects, just defined elsewhere).
from .checkpoint import (_RING_COLS, _Checkpoint,  # noqa: F401
                         _config_fingerprint, _RingSpill)
from .engine_block import (_chi2_host, _compute_block_fn,  # noqa: F401
                           _compute_block_ind_fn, _prefetch_blocks,
                           _run_jax_body, _stats_host, _unpack)
from .engine_ring import _local_blocks, _run_jax_ring  # noqa: F401
from .loaders import (_ring_sharded_tables,  # noqa: F401
                      _StreamedGLLoader, _StreamedTextLoader)


def _resolve_precision(precision: str) -> str:
    import jax
    if precision != "auto":
        return precision
    return "f32" if jax.default_backend() == "tpu" else "f64"


def run_jax(pars: Params, out_fh=None) -> None:
    import jax

    # Persistent compilation cache: the CLI is a fresh process per run, and
    # a cold Pallas/XLA compile costs seconds (tens of seconds through a
    # tunneled device). Opt out with NGSLD_JAX_CACHE="".
    cache_dir = os.environ.get("NGSLD_JAX_CACHE", "/tmp/ngsld_jax_cache")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        except Exception:
            pass

    prec = _resolve_precision(pars.precision)
    if prec == "f64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from .ops.preprocess import preprocess

    dt = jnp.float64 if prec == "f64" else jnp.float32
    log = RunLog(pars.verbose)
    if pars.verbose >= 1:
        echo_config(pars, f"(jax, {jax.default_backend()}, {prec})")

    # resolve --shard 0 ("all devices") to a CONCRETE count exactly once:
    # the block decomposition (and therefore checkpoint shard compatibility)
    # must not silently depend on the device count of whatever machine a
    # checkpoint is resumed on — the resolved value joins the fingerprint
    n_avail = len(jax.devices())
    if not pars.shard:
        # --shard 0 = "all devices" — the devices LEFT OVER after the
        # individual axis takes its share, so --shard 0 --shard_ind M works
        pars.shard = n_avail // max(1, getattr(pars, "shard_ind", 1))
        if not pars.shard:
            raise strict.StrictError(
                "shard", f"--shard_ind {pars.shard_ind} > {n_avail} devices")
    if pars.shard * max(1, getattr(pars, "shard_ind", 1)) > n_avail:
        raise strict.StrictError(
            "shard", f"--shard {pars.shard} x --shard_ind "
            f"{getattr(pars, 'shard_ind', 1)} > {n_avail} devices")
    if getattr(pars, "ring", False) and pars.shard == 1 and n_avail > 1:
        log.log(1, "==> WARNING: --ring with --shard 1 runs a degenerate "
                   f"1-device ring ({n_avail} devices available); "
                   "pass --shard 0 for all devices")

    profile_dir = getattr(pars, "profile", None)
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    close = False
    if out_fh is None:
        if pars.out is not None:
            path = pars.out
            if getattr(pars, "ring", False) and jax.process_count() > 1:
                # multi-host ring: every process runs this program and owns
                # its resident blocks' rows; a shared path would have the
                # hosts truncate/interleave each other. Each host writes its
                # own shard (merge with `ngsld-merge OUT` afterwards).
                path = f"{pars.out}.part{jax.process_index():05d}"
                log.log(1, f"==> multi-host ring: this process writes {path}"
                           f" (merge: ngsld-merge {pars.out})")
            out_fh = open(path, "wb")
            close = True
        else:
            out_fh = getattr(sys.stdout, "buffer", sys.stdout)

    from .engine_block import StripCompileError
    from .utils.keepalive import DeviceKeepalive

    def _body():
        from .engine_ring import RingNarrowBand
        with DeviceKeepalive() as ka:
            if getattr(pars, "ring", False):
                # ring mode owns its own step-granular checkpoint
                # (_RingSpill, built inside _run_jax_ring once the block
                # decomposition is known)
                try:
                    _run_jax_ring(pars, out_fh, log, prec, dt, profile_dir,
                                  touch=ka.touch, hold=ka.hold)
                except RingNarrowBand as e:
                    # raised before any IO/output: the band fits inside
                    # one ring step's sub-block, so the rectangle sweep
                    # would be mostly dead lanes — run the replicated-
                    # table block engine instead (same output contract)
                    log.log(1, f"==> --ring auto-route: {e}; using the "
                               "block engine (NGSLD_RING_AUTOROUTE=0 or "
                               "--ring_sub N to force the ring)")
                    _run_jax_body(pars, out_fh, log, prec, dt,
                                  profile_dir, touch=ka.touch,
                                  hold=ka.hold)
            else:
                # block mode builds its _Checkpoint inside the driver too:
                # the fingerprint depends on which sweep (gather vs strip)
                # the engine selects, which needs the plan
                _run_jax_body(pars, out_fh, log, prec, dt, profile_dir,
                              touch=ka.touch, hold=ka.hold)

    try:
        try:
            _body()
        except StripCompileError as e:
            # a kernel that fails BEFORE any output is a recoverable
            # planning choice, not a run killer: retry the whole run on
            # the gathered-pair sweep — when the output can be rewound
            # and no checkpoint manifest has pinned the strip decomposition
            if getattr(pars, "checkpoint", None):
                raise
            if close:
                out_fh.close()
                out_fh = open(path, "wb")
            elif hasattr(out_fh, "seek"):
                out_fh.seek(0)
                out_fh.truncate()
            else:
                raise
            log.log(0, f"==> WARNING: {e}; retrying with the "
                       "gathered-pair sweep")
            os.environ["NGSLD_NO_STRIP"] = "1"
            try:
                _body()
            finally:
                os.environ.pop("NGSLD_NO_STRIP", None)
    finally:
        if close:
            out_fh.close()
