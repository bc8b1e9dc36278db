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

import functools
import hashlib
import json
import math
import os
import sys
import time

import numpy as np

from . import strict
from .config import Params
from .utils.logging import RunLog, echo_config


def _resolve_precision(precision: str) -> str:
    import jax
    if precision != "auto":
        return precision
    return "f32" if jax.default_backend() == "tpu" else "f64"


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

    def compute(gn, eg, maf, s1, s2):
        gn1, gn2 = jnp.take(gn, s1, axis=0), jnp.take(gn, s2, axis=0)
        eg1, eg2 = jnp.take(eg, s1, axis=0), jnp.take(eg, s2, axis=0)
        maf1, maf2 = jnp.take(maf, s1), jnp.take(maf, s2)
        r2p, f, n_iter, n_used, *_rest = step(gn1, gn2, eg1, eg2,
                                              maf1, maf2)
        fmat = jnp.concatenate([r2p[:, None].astype(f.dtype), f], axis=1)
        idt = jnp.int16 if gn.shape[1] <= 32767 else jnp.int32
        imat = jnp.stack([n_iter.astype(idt), n_used.astype(idt)], axis=1)
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

    def compute(gn, eg, maf, s1, s2):
        gn1, gn2 = jnp.take(gn, s1, axis=0), jnp.take(gn, s2, axis=0)
        eg1, eg2 = jnp.take(eg, s1, axis=0), jnp.take(eg, s2, axis=0)
        maf1, maf2 = jnp.take(maf, s1), jnp.take(maf, s2)
        r2p = pearson_r2(eg1, eg2)
        if use_pallas:
            from .kernels.pallas_em import (pair_em_rows_from_gl,
                                            pair_em_sorted, pick_pair_tile,
                                            pick_rows_tile)
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
            else:  # cohort too large for any kernel's VMEM tiles
                f, n_iter, n_used = pair_em(gn1, gn2, maf1, maf2,
                                            ignore_miss_data)
        else:
            f, n_iter, n_used = pair_em(gn1, gn2, maf1, maf2, ignore_miss_data)
        fmat = jnp.concatenate([r2p[:, None].astype(f.dtype), f],
                               axis=1)  # (P, 5)
        # nIter <= 100 and n_used <= n_ind: int16 halves the metadata bytes
        # on the host link (int32 when the cohort could overflow it)
        idt = jnp.int16 if gn.shape[1] <= 32767 else jnp.int32
        imat = jnp.stack([n_iter.astype(idt),
                          n_used.astype(idt)], axis=1)  # (P, 2)
        return fmat, imat

    if n_shards > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as PS

        from .parallel.mesh import make_mesh
        mesh = make_mesh(n_shards, 1, devices=jax.devices()[:n_shards])
        rep, shd = PS(), PS("pairs")
        compute = shard_map(
            compute, mesh=mesh,
            in_specs=(rep, rep, rep, shd, shd),
            out_specs=(shd, shd), check_vma=False)
    return jax.jit(compute)


class _StreamedGLLoader:
    """Binary GL fast path: np.fromfile slabs in a reader thread, device_put
    slabs in an uploader thread, one device-side concatenate at join().

    Replaces read -> f64 normalize -> f32 narrow -> monolithic upload (three
    serial full-data passes) with a read/upload pipeline; normalization moves
    into the device preprocess (ops.preprocess raw=True). Only used when the
    file size matches exactly (ngsLD.cpp:55 semantics) — anything else falls
    back to strict.read_geno, which raises the reference's exact errors.

    NaN parity: the reference errors on NaN after post_prob
    (read_data.cpp:44-45). Raw NaN inputs are checked per slab; all-(-inf)
    log-scale records (which post_prob turns into NaN) are too.
    """

    SLAB_BYTES = 256 << 20

    @staticmethod
    def applicable(pars) -> bool:
        if not pars.in_bin or os.environ.get("NGSLD_NO_FASTBIN") == "1":
            return False
        try:
            size = os.path.getsize(pars.in_geno)
        except OSError:
            return False
        return size == pars.n_sites * pars.n_ind * 3 * 8

    def __init__(self, pars, np_dtype, touch=lambda: None, hold=None):
        import queue
        import threading
        self._pars = pars
        self._dt = np_dtype
        self._touch = touch
        import contextlib
        self._hold = hold or contextlib.nullcontext
        self._q = queue.Queue(maxsize=2)
        self._slabs = []
        self._err = []
        self._reader = threading.Thread(
            target=self._read, daemon=True, name="ngsld-gl-read")
        self._uploader = threading.Thread(
            target=self._upload, daemon=True, name="ngsld-gl-upload")
        self._reader.start()
        self._uploader.start()

    def _read(self):
        p = self._pars
        n, m = p.n_sites, p.n_ind
        slab_sites = max(1, self.SLAB_BYTES // (m * 3 * 8))
        try:
            with open(p.in_geno, "rb") as fh:
                s = 0
                while s < n:
                    k = min(slab_sites, n - s)
                    a = np.fromfile(fh, dtype=np.float64,
                                    count=k * m * 3).reshape(k, m, 3)
                    a = a.astype(self._dt, copy=False)
                    # NaN parity checks on the NARROWED slab (half the
                    # bytes), mirroring the reference's NaN-after-post_prob
                    # error (read_data.cpp:42-45): raw NaN; +inf anywhere
                    # (inf - inf in the normalize); log-scale all-(-inf)
                    # records (-inf - -inf); linear-scale negatives (log ->
                    # NaN). Linear zeros are FINE: conv_space clamps the
                    # -inf to a finite -INF (gen_func.cpp:127-128). The one
                    # deviation: a finite f64 > f32-max narrows to +inf and
                    # errors here where the f64 reference would accept it —
                    # use --precision f64 for such (pathological) inputs.
                    bad = np.isnan(a).any() or np.isposinf(a).any()
                    if not bad:
                        if p.in_logscale:
                            bad = np.isneginf(a).all(axis=-1).any()
                        else:
                            bad = bool((a < 0).any())
                    if bad:
                        raise strict.StrictError(
                            "read_geno",
                            "NaN found! Is the file format correct?")
                    self._q.put(a)
                    s += k
            self._q.put(None)
        except BaseException as e:
            self._err.append(e)
            self._q.put(None)

    def _upload(self):
        import jax
        try:
            while True:
                a = self._q.get()
                if a is None:
                    return
                with self._hold():
                    self._slabs.append(jax.device_put(a))
                self._touch()
        except BaseException as e:
            self._err.append(e)
            # drain so the reader never blocks on a full queue
            while self._q.get() is not None:
                pass

    def join(self):
        import jax.numpy as jnp
        self._reader.join()
        self._uploader.join()
        if self._err:
            raise self._err[0]
        return (jnp.concatenate(self._slabs, axis=0)
                if len(self._slabs) > 1 else self._slabs[0])


class _StreamedTextLoader:
    """gz-text GL fast path (Beagle probs / called-genotype formats):
    decompressed chunks parse through the native line parser in a reader
    thread while an uploader thread device_puts the slabs — the text-input
    analogue of _StreamedGLLoader. Records arrive already log-normalized
    (parse_geno_line is the same code path as ngsld_read_geno_text), so the
    engine's standard (raw=False) preprocess applies.

    EOF parity with read_geno (read_data.cpp:33,106-109): fewer lines than
    n_sites -> 'premature EOF'; ANY byte after the n_sites-th record ->
    'not at EOF'. NGSLD_NO_FASTTEXT=1 opts out."""

    CHUNK_BYTES = 48 << 20

    @staticmethod
    def applicable(pars) -> bool:
        if pars.in_bin or os.environ.get("NGSLD_NO_FASTTEXT") == "1":
            return False
        try:
            from .native import get_lib
            return get_lib() is not None
        except Exception:
            return False

    def __init__(self, pars, np_dtype, touch=lambda: None, hold=None):
        import contextlib
        import queue
        import threading
        self._pars = pars
        self._dt = np_dtype
        self._touch = touch
        self._hold = hold or contextlib.nullcontext
        self._q = queue.Queue(maxsize=2)
        self._slabs = []
        self._err = []
        self._reader = threading.Thread(
            target=self._read, daemon=True, name="ngsld-gltext-read")
        self._uploader = threading.Thread(
            target=self._upload, daemon=True, name="ngsld-gltext-upload")
        self._reader.start()
        self._uploader.start()

    def _read(self):
        from .native import parse_geno_text_native
        p = self._pars
        n = p.n_sites
        try:
            with strict.open_maybe_gz(p.in_geno, "rb") as fh:
                carry = b""
                s = 0
                leftover = b""
                while True:
                    data = fh.read(self.CHUNK_BYTES)
                    eof = not data
                    buf = carry + data
                    if eof:
                        if not buf:
                            break
                        chunk, carry = buf + b"\n", b""  # final bare line
                    else:
                        cut = buf.rfind(b"\n")
                        if cut < 0:
                            carry = buf
                            continue
                        chunk, carry = buf[:cut + 1], buf[cut + 1:]
                    if s >= n:
                        leftover = chunk
                        break
                    recs, used = parse_geno_text_native(
                        chunk, p.in_probs, p.in_logscale, p.n_ind, s,
                        min(chunk.count(b"\n"), n - s))
                    if len(recs):
                        self._q.put(recs.astype(self._dt, copy=False))
                    s += len(recs)
                    if used < len(chunk):
                        leftover = chunk[used:]
                        break
                    if eof:
                        break
                if s < n:
                    raise strict.StrictError(
                        "read_geno", "GENO file at premature EOF. "
                        "Check GENO file and number of sites!")
                if leftover or carry or fh.read(1):
                    raise strict.StrictError(
                        "read_geno", "GENO file not at EOF. "
                        "Check GENO file and number of sites!")
            self._q.put(None)
        except BaseException as e:
            self._err.append(e)
            self._q.put(None)

    def _upload(self):
        import jax
        try:
            while True:
                a = self._q.get()
                if a is None:
                    return
                with self._hold():
                    self._slabs.append(jax.device_put(a))
                self._touch()
        except BaseException as e:
            self._err.append(e)
            while self._q.get() is not None:  # unblock the reader
                pass

    def join(self):
        import jax.numpy as jnp
        self._reader.join()
        self._uploader.join()
        if self._err:
            raise self._err[0]
        return (jnp.concatenate(self._slabs, axis=0)
                if len(self._slabs) > 1 else self._slabs[0])


def _ring_sharded_tables(pars, mesh, n_dev, B, Sp, np_dt, log,
                         touch=lambda: None, hold=None):
    """Site-sharded table load for --ring: stream each ADDRESSABLE device's
    B-row block straight from the GENO file and assemble the global
    (Sp, n_ind, 3) 'sites'-sharded array with
    jax.make_array_from_single_device_arrays — the global table is never
    materialized on any host. Host RSS is O(one block + one slab); on a
    multi-host pod each process reads only its own devices' blocks (binary
    input seeks; text input is parsed once per host, discarding
    non-resident records as it goes).

    Returns (gl_global, raw): `raw=True` means the
    records are UNNORMALIZED file values (binary fast path) and preprocess
    must run with raw=True/in_log=pars.in_logscale; `raw=False` means
    log-normalized (text parse / strict fallback). Falls back to
    strict.read_geno (exact reference error surface) when neither fast
    path applies; that fallback IS O(table) on the host and logs a note.

    Reference parity: the load semantics per record match read_data.cpp
    13-116 via the same code paths the block engine's streamed loaders use.
    """
    import contextlib
    import jax
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as PS
    hold = hold or contextlib.nullcontext

    n, m = pars.n_sites, pars.n_ind
    shd = NamedSharding(mesh, PS("sites", None, None))
    devices = list(mesh.devices.reshape(-1))
    my = [(k, d) for k, d in enumerate(devices) if
          d.process_index == jax.process_index()]
    pad_val = np_dt(np.log(1.0 / 3.0))

    def assemble(shards):
        return jax.make_array_from_single_device_arrays(
            (Sp, m, 3), shd, shards)

    slab_bytes = int(os.environ.get("NGSLD_SLAB_BYTES",
                                    _StreamedGLLoader.SLAB_BYTES))

    if _StreamedGLLoader.applicable(pars):
        # binary fast path: RAW f64 records; seek straight to each resident
        # block, narrow + NaN-check slab-wise (read_data.cpp:42-45 parity,
        # same checks as _StreamedGLLoader), normalize on device
        rec = m * 3
        slab_sites = max(1, slab_bytes // (rec * 8))
        shards = []
        with open(pars.in_geno, "rb") as fh:
            for k, d in my:
                lo = k * B
                rows = max(0, min(B, n - lo))
                # pad rows must normalize to a harmless uniform record in
                # whichever space the RAW file is in
                buf = np.full((B, m, 3),
                              pad_val if pars.in_logscale
                              else np_dt(1.0 / 3.0), np_dt)
                fh.seek(lo * rec * 8)
                s = 0
                while s < rows:
                    cnt = min(slab_sites, rows - s)
                    a = np.fromfile(fh, dtype=np.float64,
                                    count=cnt * rec).reshape(cnt, m, 3)
                    a = a.astype(np_dt, copy=False)
                    bad = np.isnan(a).any() or np.isposinf(a).any()
                    if not bad:
                        bad = (np.isneginf(a).all(axis=-1).any()
                               if pars.in_logscale else bool((a < 0).any()))
                    if bad:
                        raise strict.StrictError(
                            "read_geno",
                            "NaN found! Is the file format correct?")
                    buf[s:s + cnt] = a
                    s += cnt
                with hold():
                    shards.append(jax.device_put(buf, d))
                touch()
                del buf
        return assemble(shards), True

    if _StreamedTextLoader.applicable(pars):
        # gz-text: native chunked parse of the whole file (records arrive
        # log-normalized); only resident blocks are buffered, everything
        # else is discarded as soon as it parses
        from .native import parse_geno_text_native
        mine = {k: None for k, _ in my}
        dev_of = dict(my)
        shards = []
        chunk_bytes = min(slab_bytes, _StreamedTextLoader.CHUNK_BYTES)
        with strict.open_maybe_gz(pars.in_geno, "rb") as fh:
            carry = b""
            s = 0
            leftover = b""
            while True:
                data = fh.read(chunk_bytes)
                eof = not data
                buf = carry + data
                if eof:
                    if not buf:
                        break
                    chunk, carry = buf + b"\n", b""
                else:
                    cut = buf.rfind(b"\n")
                    if cut < 0:
                        carry = buf
                        continue
                    chunk, carry = buf[:cut + 1], buf[cut + 1:]
                if s >= n:
                    leftover = chunk
                    break
                recs, used = parse_geno_text_native(
                    chunk, pars.in_probs, pars.in_logscale, m, s,
                    min(chunk.count(b"\n"), n - s))
                got = len(recs)
                # scatter this chunk's records into resident block buffers
                r0 = 0
                while r0 < got:
                    g = s + r0
                    k = g // B
                    take = min(got - r0, (k + 1) * B - g)
                    if k in mine:
                        if mine[k] is None:
                            mine[k] = np.full((B, m, 3), pad_val, np_dt)
                        mine[k][g - k * B:g - k * B + take] = \
                            recs[r0:r0 + take].astype(np_dt, copy=False)
                    r0 += take
                s += got
                # a block is complete once the stream passes its end
                for k in sorted(mine):
                    if mine[k] is not None and (k + 1) * B <= s:
                        with hold():
                            shards.append(
                                jax.device_put(mine[k], dev_of[k]))
                        touch()
                        del mine[k]
                if used < len(chunk):
                    leftover = chunk[used:]
                    break
                if eof:
                    break
            if s < n:
                raise strict.StrictError(
                    "read_geno", "GENO file at premature EOF. "
                    "Check GENO file and number of sites!")
            if leftover or carry or fh.read(1):
                raise strict.StrictError(
                    "read_geno", "GENO file not at EOF. "
                    "Check GENO file and number of sites!")
        for k in sorted(mine):   # tail blocks (partial or all-pad)
            b = mine[k]
            if b is None:
                b = np.full((B, m, 3), pad_val, np_dt)
            with hold():
                shards.append(jax.device_put(b, dev_of[k]))
            touch()
        return assemble(shards), False

    # fallback: strict reader (exact reference error surface); this DOES
    # materialize the table on the host — fine for small runs, logged so
    # at-scale users notice
    log.log(2, "==> ring: input not stream-shardable; using the strict "
               "reader (host memory O(table))")
    geno_log = strict.read_geno(pars.in_geno, pars.in_bin, pars.in_probs,
                                pars.in_logscale, m, n)
    shards = []
    for k, d in my:
        lo = k * B
        buf = np.full((B, m, 3), pad_val, np_dt)
        rows = max(0, min(B, n - lo))
        if rows:
            buf[:rows] = np.asarray(geno_log[lo:lo + rows], np_dt)
        with hold():
            shards.append(jax.device_put(buf, d))
        touch()
    return assemble(shards), False


def _prefetch_blocks(gen, depth: int = 4):
    """Run a generator in a daemon thread, yielding through a bounded queue.

    Plan construction (plan.band) is a multi-second NumPy pass at large
    n_sites; the big ops release the GIL, so producing blocks concurrently
    hides the plan behind device compute. Closing the returned generator
    stops the producer promptly (GracefulStop path)."""
    import queue
    import threading

    q = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END, _ERR = object(), object()

    def produce():
        try:
            for item in gen:
                while True:
                    if stop.is_set():
                        return
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
            q.put(_END)
        except BaseException as e:  # surface plan errors on the consumer
            q.put((_ERR, e))

    t = threading.Thread(target=produce, daemon=True,
                         name="ngsld-plan-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
                raise item[1]
            yield item
    finally:
        stop.set()


def _stats_host(f):
    """NumPy mirror of ops.stats.ld_stats: same op order, same dtype as the
    EM output, so host-derived stats match device-derived ones bitwise
    (ngsLD.cpp:296-306 semantics, incl. the C min() NaN asymmetry)."""
    maf0 = 1 - (f[:, 0] + f[:, 1])
    maf1 = 1 - (f[:, 0] + f[:, 2])
    D = f[:, 0] * f[:, 3] - f[:, 1] * f[:, 2]

    def c_min(a, b):
        return np.where(a <= b, a, b)

    with np.errstate(all="ignore"):
        neg = -c_min(maf0 * maf1, (1 - maf0) * (1 - maf1))
        pos = c_min(maf0 * (1 - maf1), (1 - maf0) * maf1)
        Dp = D / np.where(D < 0, neg, pos)
        rr = D / np.sqrt(maf0 * maf1 * (1 - maf0) * (1 - maf1))
        return maf0, maf1, D, Dp, rr * rr


def _chi2_host(f):
    """NumPy mirror of ops.stats.chi2_stat: float32 accumulator, terms in
    the EM dtype (the reference computes chi2 in float, ngsLD.cpp:328-333)."""
    f32 = np.float32
    freq_A = (f[:, 0] + f[:, 1]).astype(f32)
    freq_B = (f[:, 0] + f[:, 2]).astype(f32)
    exp_hap = np.stack([freq_A * freq_B, freq_A * (1 - freq_B),
                        (1 - freq_A) * freq_B, (1 - freq_A) * (1 - freq_B)],
                       axis=1)
    with np.errstate(all="ignore"):
        diff = f - exp_hap.astype(f.dtype)
        terms = (diff * diff) / exp_hap.astype(f.dtype)
        chi2 = np.zeros(f.shape[0], f32)
        for i in range(4):  # sequential float32 rounding, like the reference
            chi2 = (chi2.astype(f.dtype) + terms[:, i]).astype(f32)
    return chi2


def _unpack(fmat, imat, extend_out=True):
    r2p, f = fmat[:, 0], fmat[:, 1:5]
    hmaf0, hmaf1, D, Dp, r2 = _stats_host(f)
    chi2 = _chi2_host(f) if extend_out \
        else np.zeros(len(f), np.float32)  # column not printed
    return (r2p, f, imat[:, 0], imat[:, 1], hmaf0, hmaf1, D, Dp, r2, chi2)


def _config_fingerprint(pars: Params, extra: dict = None) -> str:
    """Identifies a run for checkpoint compatibility: anything that changes
    the pair plan or the numbers invalidates existing shards."""
    key = {k: getattr(pars, k) for k in (
        "in_geno", "in_probs", "in_logscale", "n_ind", "n_sites", "in_pos",
        "in_pos_header", "max_kb_dist", "max_snp_dist", "min_maf",
        "ignore_miss_data", "call_geno", "N_thresh", "call_thresh",
        "rnd_sample", "extend_out", "precision", "chunk_pairs")}
    if pars.rnd_sample < 1.0:
        # the seed shapes the pair plan only when sampling; with the default
        # time-based seed and no sampling, resume must still work
        key["seed"] = pars.seed
    if extra:
        key.update(extra)
    return hashlib.sha256(json.dumps(key, sort_keys=True).encode()).hexdigest()[:16]


_RING_COLS = ("r2p", "f", "n_iter", "n_used", "hmaf1", "hmaf2",
              "D", "Dp", "r2", "chi2")


class _RingSpill:
    """Ring-mode emission spill + (--checkpoint) resume state.

    Every completed (sub-ring, ring step) writes each RESIDENT block's
    compacted surviving rows — the step tile after band / triangle / MAF
    masking — as one structured .npy per block, then commits the step with
    an atomic .done marker. Host memory during the sweep is O(one step's
    rows); the end-of-sweep emit is a bounded-memory merge over the spill
    (see _run_jax_ring), not an in-RAM accumulation — the all-pairs pod
    configs (SURVEY.md §7: ~1e13 pairs) are output-dominated and would OOM
    any host otherwise.

    With --checkpoint the spill dir IS the checkpoint: completed steps
    (markers present) skip compute on resume and their tiles feed the merge
    straight from disk; the visiting ring state fast-forwards with a single
    offset ppermute (parallel.ring.ring_subblock_taker offset=). Without
    --checkpoint the spill lives in a TemporaryDirectory. The reference has
    no checkpointing at all (SURVEY.md §5: a killed run restarts).

    On a multi-host pod every process writes its own p{proc} files into the
    shared dir; the manifest is identical across hosts so the concurrent
    writes are benign, and recomputed steps overwrite tiles with identical
    bytes (the sweep is deterministic), so heterogeneous death points can't
    corrupt."""

    def __init__(self, cdir: str, pars: Params, extra: dict, proc: int,
                 persistent: bool):
        self.dir = cdir
        self.proc = proc
        self.persistent = persistent
        os.makedirs(cdir, exist_ok=True)
        if not persistent:
            return
        fp = _config_fingerprint(pars, extra)
        mpath = os.path.join(cdir, "MANIFEST.json")
        if os.path.exists(mpath):
            with open(mpath) as fh:
                man = json.load(fh)
            if man.get("fingerprint") != fp:
                raise strict.StrictError(
                    "checkpoint", f"checkpoint dir {cdir} belongs to a "
                    "different run configuration; remove it or change --checkpoint")
        else:
            # atomic: concurrent first-writers (multi-host shared dir) and
            # crashes must never leave a truncated manifest behind
            tmp = mpath + f".tmp{proc}"
            with open(tmp, "w") as fh:
                json.dump({"fingerprint": fp, "mode": "ring"}, fh)
            os.replace(tmp, mpath)

    def _stem(self, si: int, t: int) -> str:
        return os.path.join(
            self.dir, f"ring_p{self.proc:05d}_s{si:04d}_t{t:04d}")

    def tile_path(self, si: int, t: int, i: int) -> str:
        return f"{self._stem(si, t)}_b{i:05d}.npy"

    def done(self, si: int, t: int) -> bool:
        return os.path.exists(self._stem(si, t) + ".done")

    @staticmethod
    def pack(cols: dict) -> np.ndarray:
        """{col: ndarray} -> one structured record array (rows stay in the
        tile's row-major (a, pj) order)."""
        n = len(cols["a"])
        fields = [("a", np.int64), ("pj", np.int64)]
        for k in _RING_COLS:
            v = cols[k]
            fields.append((k, v.dtype, v.shape[1:]) if v.ndim > 1
                          else (k, v.dtype))
        rec = np.empty(n, dtype=np.dtype(fields))
        rec["a"], rec["pj"] = cols["a"], cols["pj"]
        for k in _RING_COLS:
            rec[k] = cols[k]
        return rec

    def save_step(self, si: int, t: int, blocks: dict) -> None:
        """blocks: {resident block index -> {col: ndarray} or None}.
        Tiles write atomically; the .done marker commits the step last.

        Any tile files already present for this (si, t) are stale — left
        by a crashed, uncommitted attempt (or a multi-host recompute below
        the collective resume point) — and are removed first, so the merge
        glob never mixes them in even if a recompute diverges."""
        import glob as _g
        for stale in _g.glob(self._stem(si, t) + "_b*.npy"):
            os.unlink(stale)
        for i, cols in blocks.items():
            if cols is None:
                continue
            p = self.tile_path(si, t, i)
            with open(p + ".tmp", "wb") as fh:
                np.save(fh, self.pack(cols))
            os.replace(p + ".tmp", p)
        marker = self._stem(si, t) + ".done"
        with open(marker + ".tmp", "w"):
            pass
        os.replace(marker + ".tmp", marker)

    def block_tiles(self, i: int) -> list:
        """All committed spill tiles of resident block i, (si, t)-sorted
        (merge order is re-established by the (a, pj) lexsort anyway)."""
        import glob as _g
        pat = os.path.join(self.dir,
                           f"ring_p{self.proc:05d}_s*_t*_b{i:05d}.npy")
        return sorted(_g.glob(pat))


class _Checkpoint:
    """Per-block output shards: part_NNNNNN.tsv written atomically; a
    manifest pins the config fingerprint. Completed blocks are skipped on
    resume; the final output is the in-order concatenation."""

    def __init__(self, cdir: str, pars: Params, log: RunLog, extra: dict = None):
        self.dir = cdir
        self.log = log
        os.makedirs(cdir, exist_ok=True)
        fp = _config_fingerprint(pars, extra)
        mpath = os.path.join(cdir, "MANIFEST.json")
        if os.path.exists(mpath):
            with open(mpath) as fh:
                man = json.load(fh)
            if man.get("fingerprint") != fp:
                raise strict.StrictError(
                    "checkpoint", f"checkpoint dir {cdir} belongs to a "
                    "different run configuration; remove it or change --checkpoint")
        else:
            tmp = mpath + ".tmp"
            with open(tmp, "w") as fh:
                json.dump({"fingerprint": fp}, fh)
            os.replace(tmp, mpath)  # never leave a truncated manifest

    def path(self, i: int) -> str:
        return os.path.join(self.dir, f"part_{i:06d}.tsv")

    def done(self, i: int) -> bool:
        return os.path.exists(self.path(i))

    def open_block(self, i: int):
        return open(self.path(i) + ".tmp", "wb")

    def commit_block(self, i: int) -> None:
        os.replace(self.path(i) + ".tmp", self.path(i))

    def concatenate(self, out_fh, n_blocks: int) -> None:
        binary = not hasattr(out_fh, "encoding")
        for i in range(n_blocks):
            with open(self.path(i), "rb") as fh:
                while True:
                    chunk = fh.read(1 << 20)
                    if not chunk:
                        break
                    out_fh.write(chunk if binary else chunk.decode())


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

    ckpt_dir = getattr(pars, "checkpoint", None)
    # ring mode owns its own step-granular checkpoint (_RingSpill,
    # built inside _run_jax_ring once the block decomposition is known).
    # The block engine's fingerprint pins the EFFECTIVE chunk (chunk_pairs
    # rounded up to a shard multiple): a resume with a different --shard
    # that changes the rounding would reuse part shards from a different
    # block decomposition.
    ckpt = None
    if ckpt_dir and not getattr(pars, "ring", False):
        eff_chunk = -(-int(pars.chunk_pairs) // pars.shard) * pars.shard
        ckpt = _Checkpoint(ckpt_dir, pars, log,
                           extra={"chunk": eff_chunk})

    from .utils.keepalive import DeviceKeepalive
    try:
        with DeviceKeepalive() as ka:
            if getattr(pars, "ring", False):
                _run_jax_ring(pars, out_fh, log, prec, dt, profile_dir,
                              touch=ka.touch, hold=ka.hold)
            else:
                _run_jax_body(pars, out_fh, log, ckpt, prec, dt, profile_dir,
                              touch=ka.touch, hold=ka.hold)
    finally:
        if close:
            out_fh.close()


def _local_blocks(arr, B: int):
    """{block index -> host ndarray} for this process's ADDRESSABLE shards
    of a 'sites'-sharded array (multi-host: each host only ever touches the
    blocks it owns; np.asarray on the global array would raise)."""
    out = {}
    for sh in arr.addressable_shards:
        start = sh.index[0].start or 0
        out[start // B] = np.asarray(sh.data)
    return out


def _run_jax_ring(pars, out_fh, log, prec, dt, profile_dir,
                  touch=lambda: None, hold=None):
    """Site-sharded ring sweep driver (--ring).

    The replicated-table engine (_run_jax_body) assumes the GL/E[G] tables
    fit on every device; at reference scale they don't (5M sites x 500 ind
    ~ 30 GB fp32, SURVEY.md §7). Here the preprocessed tables are sharded
    over a 1-D 'sites' mesh — one contiguous block per device — and
    partner blocks ride the ring via ppermute (parallel.ring).

    After each ring step, this host pulls ONLY its addressable (resident)
    blocks' stat tiles, masks them (band, triangle, MAF, real sites) and
    keeps just the compacted surviving rows, so host memory is O(emitted
    rows), not O(n_steps * S * B) tiles; device memory is O(table/n_dev +
    B^2 stats) per device (size the mesh so B = S/n_dev stays ~10^4). Rows
    are emitted per resident block in (s1, s2) order — on a multi-host pod
    every host runs the same program (collectives ride ICI/DCN) and writes
    the shard holding its own blocks' rows.

    With --checkpoint the sweep is resumable at (sub-ring, ring step)
    granularity (_RingSpill): completed steps' tiles feed the merge from
    disk and the visiting state fast-forwards via an offset ppermute
    (the reference has no resume at all, SURVEY.md §5).
    """
    import contextlib
    hold = hold or contextlib.nullcontext
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as PS

    from .io.writer import RowWriter
    from .parallel.ring import ring_sweep_stepper
    from .plan.band import band_limits, contig_positions

    n_dev = pars.shard   # resolved once in run_jax
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("sites",))

    tmp_spill = None
    try:
        with log.phase("Getting sites coordinates"):
            if pars.in_pos:
                pos_dist, labels = strict.read_pos(
                    pars.in_pos, pars.in_pos_header, pars.n_sites)
            else:
                pos_dist = np.full(pars.n_sites, math.inf)
                labels = ["(null)"] * pars.n_sites

        n = pars.n_sites
        B = -(-n // n_dev)
        # sub-block ring: visiting state rotates B_sub-row sub-blocks so the
        # per-step stat tile is (B, B_sub) — a full (B, B) tile would not
        # fit device memory at pod scale, and narrow bands waste less
        # out-of-band compute. 0 = auto (~4k sites per sub-block).
        n_sub = getattr(pars, "ring_sub", 0) or max(1, -(-B // 4096))
        n_sub = min(n_sub, B)
        # Strip-kernel stepper (kernels/pallas_strip): the per-step tile
        # computes in VMEM with per-anchor early exit + in-kernel band
        # bounds — the ring's fast path on TPU (f32). NGSLD_FORCE_STRIP=1
        # forces it elsewhere (interpret mode; f32-grade values) for
        # tests. Needs B/B_sub aligned to the 128-lane tile quanta.
        from .kernels.pallas_strip import TA as _TA
        from .kernels.pallas_strip import vmem_ok as _strip_vmem_ok
        force_strip = os.environ.get("NGSLD_FORCE_STRIP") == "1"
        use_strip = _strip_vmem_ok(pars.n_ind) and (
            force_strip or (jax.default_backend() == "tpu"
                            and prec == "f32"))
        if use_strip:
            B = -(-B // (n_sub * _TA)) * (n_sub * _TA)
        else:
            B = -(-B // n_sub) * n_sub   # sub-blocks must divide the block
        B_sub = B // n_sub
        Sp = B * n_dev
        from .ops.preprocess import preprocess
        np_dt = np.float64 if prec == "f64" else np.float32
        with log.phase("Reading data from file (site-sharded stream)"):
            gl_d, raw_gl = _ring_sharded_tables(
                pars, mesh, n_dev, B, Sp, np_dt, log, touch=touch, hold=hold)
        with log.phase("Preprocessing (site-sharded) on device"):
            pre = jax.jit(functools.partial(
                preprocess, call=pars.call_geno, N_thresh=pars.N_thresh,
                call_thresh=pars.call_thresh,
                ignore_miss_data=pars.ignore_miss_data,
                raw=raw_gl, in_log=pars.in_logscale),
                # free the log-GL table as the normalized tables build:
                # device memory is the ring's scarce resource (CPU ignores
                # donation, so only donate where it works)
                donate_argnums=(0,) if jax.default_backend() == "tpu"
                else ())
            with hold():
                gn_d, maf_d, eg_d = pre(gl_d)
                del gl_d
                if jax.process_count() == 1:
                    maf = np.array(maf_d, np.float64)[:n]
                else:
                    # masks need GLOBAL MAFs (partner blocks live on other
                    # hosts); allgather the (tiny) vector over DCN
                    from jax.experimental import multihost_utils
                    maf = np.array(multihost_utils.process_allgather(
                        maf_d, tiled=True), np.float64)[:n]
            touch()

        from .refine import (StrictRefiner, degenerate_tiers,
                             knife_edge_sites)
        refiner = None

        def get_refiner():
            nonlocal refiner
            if refiner is None:
                refiner = StrictRefiner(pars)
            return refiner

        no_refine = os.environ.get("NGSLD_REFINE") == "0"

        # pair-set stability: knife-edge sites take the strict f64 MAF so
        # the band masks below can never flip vs the reference. The maf
        # vector is identical on every host (allgathered above) and the
        # strict recompute is deterministic, so all hosts stay in agreement
        # (NGSLD_REFINE=0 = round-1 behavior: no repair of any kind).
        ks = (np.empty(0, np.int64)
              if os.environ.get("NGSLD_REFINE") == "0"
              else knife_edge_sites(maf, pars.min_maf, prec))
        if len(ks):
            maf[ks] = get_refiner().exact_maf(ks)
            log.log(2, f"==> strict MAF refinement: {len(ks)} knife-edge "
                       f"site(s) at min_maf={pars.min_maf}")
            log.count("maf_refined_sites", len(ks))

        hi = band_limits(pos_dist, pars.max_kb_dist, pars.max_snp_dist)
        contig, pos = contig_positions(pos_dist)
        ok = ~(maf < pars.min_maf)            # NaN passes, ngsLD.cpp:264/270

        # --rnd_sample: replicate the reference's draw discipline (one taus
        # uniform per surviving candidate, in s2 order, from a per-anchor
        # child stream, ngsLD.cpp:164-166,277) without host-planning the
        # global pair set: each host materializes only its RESIDENT anchors'
        # sampled draw-index sets (cost/memory ~ its own emitted rows), and
        # a pair's draw index is recovered in O(1) as the ok-prefix-sum
        # rank of the partner within the anchor's band.
        samp_keys = okc = None
        if pars.rnd_sample < 1.0:
            from .gsl_rng import iter_uniform_chunks
            from .plan.band import child_seeds
            seeds = child_seeds(pars.seed, n)
            okc = np.cumsum(ok.astype(np.int64))  # okc[j] = #ok in [0, j]
            my_blocks = sorted(k for k, d in enumerate(jax.devices()[:n_dev])
                               if d.process_index == jax.process_index())
            # sampled pairs as a SORTED array of keys anchor*n + draw_index
            # (ascending anchors x ascending draw indices => concatenation
            # is already sorted; membership below is one searchsorted)
            parts = []
            with log.phase("Sampling plan (taus draws, resident anchors)"):
                for k in my_blocks:
                    lo_s, hi_s = k * B, min(k * B + B, n)
                    if lo_s >= n:
                        continue
                    anchors = np.arange(lo_s, hi_s)[ok[lo_s:hi_s]]
                    if not len(anchors):
                        continue
                    # kept-candidate count per anchor (ok partners in band)
                    m = (okc[np.maximum(hi[anchors] - 1, anchors)]
                         - okc[anchors])
                    for a0, a1, u in iter_uniform_chunks(seeds[anchors], m):
                        for r in range(a0, a1):
                            c_hit = np.flatnonzero(
                                u[r - a0, :m[r]] <= pars.rnd_sample)
                            if len(c_hit):
                                parts.append(anchors[r] * np.int64(n) + c_hit)
            samp_keys = (np.concatenate(parts) if parts
                         else np.empty(0, np.int64))
        # max forward reach of any device's anchors past its block start:
        # sub-ring (si) needs ring steps t while t*B + si*B_sub < maxspan
        starts = np.arange(n_dev) * B
        maxspan = int(max(
            (hi[s:min(s + B, n)].max(initial=0) - s) for s in starts
            if s < n))
        log.log(2, f"==> ring: {n_dev} blocks of {B} sites, {n_sub} "
                   f"sub-blocks of {B_sub}")

        import tempfile
        persistent = bool(getattr(pars, "checkpoint", None))
        if persistent:
            spill_dir = pars.checkpoint
        else:
            tmp_spill = tempfile.TemporaryDirectory(prefix="ngsld_ring_")
            spill_dir = tmp_spill.name
        spill = _RingSpill(
            spill_dir, pars,
            # strip= pins WHICH stepper produced the spilled tiles: the
            # strip kernel's f32 values differ in the last ulps from the
            # XLA stepper's, so a resume must not mix them silently
            dict(mode="ring", n_dev=n_dev, n_sub=n_sub, block=B,
                 n_proc=jax.process_count(), strip=bool(use_strip)),
            jax.process_index(), persistent)
        rck = spill if persistent else None

        if use_strip:
            from .kernels.pallas_strip import strip_tables
            from .parallel.ring import (ring_subblock_taker_strip,
                                        ring_sweep_stepper_strip)
            with log.phase("Building strip tables (sharded)"), hold():
                ga_d, gb_d, ea_d, eb_d = jax.jit(functools.partial(
                    strip_tables, n_ind=pars.n_ind))(gn_d, eg_d)
                del gn_d, eg_d   # the strip layouts replace them
                shd1 = NamedSharding(mesh, PS("sites"))
                hip = np.zeros(Sp, np.int32)
                hip[:n] = hi
                okp = np.zeros(Sp, np.float32)
                okp[:n] = ok
                hi_d = jax.device_put(hip, shd1)
                ok_d = jax.device_put(okp, shd1)
            touch()
            stepper = ring_sweep_stepper_strip(
                mesh, pars.n_ind, B, B_sub, pars.ignore_miss_data,
                pars.extend_out,
                interpret=jax.default_backend() != "tpu")
            log.log(2, f"==> ring: strip-kernel stepper "
                       f"({B // 128}x{B_sub // 128} tiles/step/device)")
        else:
            # row_chunk bounds the XLA stepper's peak memory to 256
            # anchor strips of EM intermediates while still vmapping
            # (scan-per-anchor would be ~256x more dispatches)
            stepper = ring_sweep_stepper(mesh, pars.ignore_miss_data,
                                         pars.extend_out, row_chunk=256)
        writer = RowWriter(out_fh, labels, pars.extend_out)
        if jax.process_index() == 0:
            # multi-host shards concatenate in part order; only the first
            # shard carries the header
            writer.write_header()

        def compact_tile(i, si, t, tiles):
            """Mask one resident block's (B, B_sub) step tile down to its
            surviving rows (triangle, real sites, MAF, band)."""
            A = (i * B + np.arange(B, dtype=np.int64))[:, None]    # (B, 1)
            PJ = (((i + t) % n_dev) * B + si * B_sub
                  + np.arange(B_sub, dtype=np.int64))[None, :]     # (1, Bs)
            valid = (PJ > A) & (PJ < n) & (A < n)
            valid &= ok[np.minimum(A, n - 1)] & ok[np.minimum(PJ, n - 1)]
            valid &= PJ < hi[np.minimum(A, n - 1)]   # band: s2 < hi[s1]
            if samp_keys is not None and valid.any():
                # draw index of (a, pj) = #ok candidates strictly before pj;
                # one vectorized searchsorted over all valid cells
                c = (okc[np.maximum(np.minimum(PJ, n) - 1, 0)]
                     - okc[np.minimum(A, n - 1)])
                q = (np.minimum(A, n - 1) * np.int64(n) + c)[valid]
                pos_in = np.searchsorted(samp_keys, q)
                hit = pos_in < len(samp_keys)
                hit[hit] = samp_keys[pos_in[hit]] == q[hit]
                sampled = np.zeros_like(valid)
                sampled[valid] = hit
                valid = sampled
            if not valid.any():
                return None
            out = {k: tiles[k][i][valid] for k in tiles}
            out["a"] = np.broadcast_to(A, valid.shape)[valid]
            out["pj"] = np.broadcast_to(PJ, valid.shape)[valid]
            return out

        from .parallel.ring import ring_subblock_taker
        from .utils.signals import GracefulStop
        interrupted = False
        with log.phase("compute: ring sweep"), GracefulStop(log) as gs:
            for si in range(n_sub):
                if interrupted:
                    break
                # steps needed by THIS sub-ring: partners at ring step t
                # start t*B + si*B_sub past the anchor block's start
                t_max = min(n_dev,
                            -(-(maxspan - si * B_sub) // B) if B else 0)
                if t_max <= 0:
                    continue
                t0 = 0
                if rck is not None:
                    # resume: steps commit in order, so the first missing
                    # one is where the interrupted sweep stopped. On a
                    # multi-host pod the hosts may have died at different
                    # points; every host must run the SAME collective
                    # sequence, so they agree on the minimum resume step
                    # (hosts that committed further simply recompute and
                    # overwrite — loads stay below the agreed point so no
                    # rows double-append).
                    while t0 < t_max and rck.done(si, t0):
                        t0 += 1
                    if jax.process_count() > 1:
                        from jax.experimental import multihost_utils
                        t0 = int(multihost_utils.process_allgather(
                            np.array([t0])).min())
                    # resumed steps' tiles are already in the spill; the
                    # merge phase reads them straight from disk
                    for t in range(t0):
                        log.count("ring_steps_resumed")
                    if t0:
                        log.log(2, f"==> ring ckpt: sub-ring {si} resumes "
                                   f"at step {t0}/{t_max}")
                if t0 >= t_max:
                    continue
                with hold():
                    if use_strip:
                        vis = ring_subblock_taker_strip(
                            mesh, n_sub, si, offset=t0)(
                                gb_d, eb_d, maf_d, ok_d)
                    else:
                        vis = ring_subblock_taker(
                            mesh, n_sub, si, offset=t0)(gn_d, eg_d, maf_d)
                for t in range(t0, t_max):
                    stop = gs.stopped
                    if jax.process_count() > 1:
                        # SPMD: every host must break at the SAME step or
                        # the survivors hang in the next collective — make
                        # the stop decision collective (any host stops all)
                        from jax.experimental import multihost_utils
                        stop = bool(multihost_utils.process_allgather(
                            np.array([stop])).any())
                    if stop:
                        # the last completed step is committed; a rerun
                        # with the same --checkpoint resumes right here
                        interrupted = True
                        break
                    with hold():
                        if use_strip:
                            stats, *vis = stepper(
                                ga_d, ea_d, hi_d, ok_d, maf_d, *vis,
                                jnp.int32(t), jnp.int32(si))
                            vis = tuple(vis)
                        else:
                            stats, *vis = stepper(gn_d, eg_d, maf_d, *vis)
                            vis = tuple(vis)
                        tiles = {k: _local_blocks(v, B) for k, v in
                                 stats.items()}
                    touch()
                    step_rows = {}
                    for i in sorted(next(iter(tiles.values())).keys()):
                        step_rows[i] = compact_tile(i, si, t, tiles)
                    spill.save_step(si, t, step_rows)
                    del step_rows, tiles
                    log.count("ring_steps")

        if interrupted:
            hint = (f"resume with the same --checkpoint {rck.dir}"
                    if rck is not None else
                    "rerun with --checkpoint DIR to make ring runs resumable")
            log.log(0, f"==> Interrupted mid ring sweep; completed steps "
                       f"are committed. {hint}")
            raise SystemExit(130)

        # Emit: bounded-memory merge over the spill. Each tile file is
        # already (a, pj)-sorted (row-major compaction), so rows for an
        # anchor RANGE are a contiguous slice of every tile — memmap the
        # tiles, walk per-tile cursors, and lexsort only one anchor-chunk
        # of rows at a time. Host memory is O(chunk rows), not O(emitted
        # rows); byte-identical to a global per-block lexsort because
        # (a, pj) is unique across a block's tiles.
        budget = int(os.environ.get("NGSLD_RING_EMIT_ROWS", 2_000_000))
        my_blocks = sorted(
            k for k, d in enumerate(jax.devices()[:n_dev])
            if d.process_index == jax.process_index())
        with log.phase("emit: merge + format"):
            for i in my_blocks:
                mms = [np.load(p, mmap_mode="r")
                       for p in spill.block_tiles(i)]
                total = sum(len(x) for x in mms)
                if total == 0:
                    continue
                if not pars.in_bin and not no_refine:
                    # gz-text inputs: prime the refiner's row caches for
                    # ALL of this block's fragile sites in ONE streaming
                    # parse — per-chunk priming would re-decompress the
                    # file once per merge chunk (O(chunks x file))
                    t1s, t2s = set(), set()
                    for x in mms:
                        tt = degenerate_tiers(np.asarray(x["f"]), prec)
                        for which, bag in ((tt == 1, t1s), (tt == 2, t2s)):
                            if which.any():
                                bag.update(np.asarray(x["a"])[which])
                                bag.update(np.asarray(x["pj"])[which])
                    if t1s:
                        get_refiner()._ensure(np.fromiter(t1s, np.int64))
                    if t2s:
                        get_refiner()._ensure_rows_fast(
                            np.fromiter(t2s, np.int64))
                a_lo, a_hi = i * B, min(i * B + B, n)
                step = max(1, int(budget // max(1, total // max(1, B))))
                cursors = [0] * len(mms)
                a0 = a_lo
                while a0 < a_hi:
                    a1 = min(a0 + step, a_hi)
                    parts = []
                    for j, x in enumerate(mms):
                        e = int(np.searchsorted(x["a"], a1, side="left"))
                        if e > cursors[j]:
                            parts.append(np.asarray(x[cursors[j]:e]))
                            cursors[j] = e
                    a0 = a1
                    if not parts:
                        continue
                    cat = np.concatenate(parts)
                    cat = cat[np.lexsort((cat["pj"], cat["a"]))]
                    af, pf = cat["a"], cat["pj"]
                    dist = np.where(contig[af] == contig[pf],
                                    pos[pf] - pos[af], np.inf)
                    cols = dict(
                        r2p=cat["r2p"], D=cat["D"], Dp=cat["Dp"],
                        r2=cat["r2"], f=cat["f"], hmaf1=cat["hmaf1"],
                        hmaf2=cat["hmaf2"],
                        chi2=cat["chi2"].astype(np.float32),
                        n_iter=cat["n_iter"].astype(np.int32),
                        n_used=cat["n_used"].astype(np.int32),
                        maf1=maf[af], maf2=maf[pf])
                    tiers = (np.zeros(len(cat), np.uint8) if no_refine
                             else degenerate_tiers(
                                 cat["f"], prec,
                                 extra_nonfinite=(cat["Dp"], cat["r2"])))
                    t1, t2 = tiers == 1, tiers == 2
                    if tiers.any():
                        # tier 1: bit-exact strict recompute; tier 2: fast
                        # f64 polish of the f-derived columns (refine.py);
                        # widen the chunk to f64 so one formatter call
                        # emits all populations
                        log.count("pairs_refined", int(t1.sum()))
                        log.count("pairs_polished", int(t2.sum()))
                        for k in ("r2p", "D", "Dp", "r2", "f",
                                  "hmaf1", "hmaf2"):
                            cols[k] = np.array(cols[k], np.float64)
                        cols["maf1"] = cols["maf1"].copy()
                        cols["maf2"] = cols["maf2"].copy()
                        if t2.any():
                            pol = get_refiner().polish_columns(
                                af[t2], pf[t2], cols["f"][t2])
                            for k in pol:
                                cols[k][t2] = pol[k]
                        if t1.any():
                            ref = get_refiner().refine_columns(af[t1],
                                                               pf[t1])
                            for k in cols:
                                cols[k][t1] = ref[k]
                    writer.write_block(
                        af, pf, dist, cols["r2p"], cols["D"], cols["Dp"],
                        cols["r2"], n_used=cols["n_used"],
                        maf1=cols["maf1"], maf2=cols["maf2"],
                        hap=cols["f"], hmaf1=cols["hmaf1"],
                        hmaf2=cols["hmaf2"], chi2=cols["chi2"],
                        n_iter=cols["n_iter"])
                    log.count("pairs_emitted", len(af))
        log.summary()
    finally:
        if tmp_spill is not None:
            tmp_spill.cleanup()
        if profile_dir:
            jax.profiler.stop_trace()


def _run_jax_body(pars, out_fh, log, ckpt, prec, dt, profile_dir,
                  touch=lambda: None, hold=None):
    import contextlib
    hold = hold or contextlib.nullcontext
    import jax
    import jax.numpy as jnp
    from .ops.preprocess import preprocess

    try:
        loader = None
        raw_gl = False  # loader delivers UNNORMALIZED records
        np_dt = np.float64 if dt == jnp.float64 else np.float32
        if _StreamedGLLoader.applicable(pars):
            # binary input: stream file slabs straight to the device while
            # the positions parse below runs; normalize on device
            loader = _StreamedGLLoader(pars, np_dt, touch=touch, hold=hold)
            raw_gl = True
        elif _StreamedTextLoader.applicable(pars):
            # gz-text input: native line parsing streams to the device the
            # same way; records arrive already log-normalized
            loader = _StreamedTextLoader(pars, np_dt, touch=touch, hold=hold)
        else:
            with log.phase("Reading data from file"):
                geno_log = strict.read_geno(pars.in_geno, pars.in_bin,
                                            pars.in_probs, pars.in_logscale,
                                            pars.n_ind, pars.n_sites)
        with log.phase("Getting sites coordinates"):
            if pars.in_pos:
                pos_dist, labels = strict.read_pos(
                    pars.in_pos, pars.in_pos_header, pars.n_sites)
            else:
                pos_dist = np.full(pars.n_sites, math.inf)
                labels = ["(null)"] * pars.n_sites
        if pars.verbose >= 6:
            for s in range(min(10, pars.n_sites)):
                log.log(6, f"{s}\t{pos_dist[s]:f}")

        with log.phase("Preprocessing (call_geno, MAF, E[G]) on device"):
            pre = jax.jit(functools.partial(
                preprocess, call=pars.call_geno, N_thresh=pars.N_thresh,
                call_thresh=pars.call_thresh,
                ignore_miss_data=pars.ignore_miss_data,
                raw=raw_gl, in_log=pars.in_logscale))
            if loader is not None:
                with log.phase("  gl stream+upload", level=2), hold():
                    gl_d = loader.join()
            else:
                # narrow on host first: GLs cross the host->device link
                # once, at target precision
                host_gl = np.asarray(geno_log, np.float64 if dt == jnp.float64
                                     else np.float32)
                del geno_log
                with log.phase("  gl upload", level=2), hold():
                    gl_d = jnp.asarray(host_gl)
                    gl_d.block_until_ready()
                    touch()
                del host_gl
            with log.phase("  preprocess jit", level=2):
                gn_d, maf_d, eg_d = pre(gl_d)
                touch()
            # only MAF returns to the host (the plan needs it); GL/E[G]
            # tables stay device-resident for the sweep
            with log.phase("  maf to host", level=2), hold():
                # np.array: a writable copy (knife-edge refinement writes)
                maf = np.array(maf_d, np.float64)
                touch()

        from .refine import (StrictRefiner, degenerate_tiers,
                             knife_edge_sites)
        refiner = None

        def get_refiner():
            nonlocal refiner
            if refiner is None:
                refiner = StrictRefiner(pars)
            return refiner

        no_refine = os.environ.get("NGSLD_REFINE") == "0"

        # pair-set stability: sites whose device MAF sits within precision
        # noise of min_maf get the bit-exact strict MAF, so `maf < min_maf`
        # (ngsLD.cpp:264,270) can never flip a band vs the reference
        # (NGSLD_REFINE=0 = round-1 behavior: no repair of any kind)
        ks = (np.empty(0, np.int64)
              if os.environ.get("NGSLD_REFINE") == "0"
              else knife_edge_sites(maf, pars.min_maf, prec))
        if len(ks):
            maf[ks] = get_refiner().exact_maf(ks)
            log.log(2, f"==> strict MAF refinement: {len(ks)} knife-edge "
                       f"site(s) at min_maf={pars.min_maf}")
            log.count("maf_refined_sites", len(ks))
        if pars.verbose >= 7:
            log.log(7, "==> Geno data")
            gn0 = np.asarray(gn_d[:min(10, pars.n_sites), 0, :])
            for s in range(min(10, pars.n_sites)):
                log.log(7, f"{s}\t{labels[s]}\t{maf[s]:f} "
                           f"({gn0[s,0]:f} {gn0[s,1]:f} {gn0[s,2]:f})")

        from .io.writer import RowWriter
        from .plan.band import iter_pair_blocks
        use_pallas = jax.default_backend() == "tpu" and prec == "f32"
        n_shards = pars.shard   # resolved once in run_jax
        idx_shd = None
        if getattr(pars, "shard_ind", 1) > 1:
            # 2-D ('pairs','ind') mesh: individual axis split across
            # devices (large cohorts), per-individual reductions psum
            # over ICI. Tables re-shard once (device-to-device).
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as PS
            compute, mesh2 = _compute_block_ind_fn(
                pars.ignore_miss_data, n_shards, pars.shard_ind)
            with hold():
                gn_d = jax.device_put(
                    gn_d, NamedSharding(mesh2, PS(None, "ind", None)))
                eg_d = jax.device_put(
                    eg_d, NamedSharding(mesh2, PS(None, "ind")))
                maf_d = jax.device_put(maf_d, NamedSharding(mesh2, PS()))
            touch()
            idx_shd = NamedSharding(mesh2, PS("pairs"))
            log.log(2, f"==> mesh: {n_shards} pair-shards x "
                       f"{pars.shard_ind} individual-shards")
        else:
            compute = _compute_block_fn(pars.ignore_miss_data, use_pallas,
                                        n_shards)
        # every device must receive the same per-shard shape
        chunk = -(-int(pars.chunk_pairs) // n_shards) * n_shards

        if ckpt is not None:
            # per-block RowWriters share one label blob (building it is
            # O(n_sites) — once, not once per block)
            try:
                from .native import LabelBlob, get_lib, make_labels_blob
                if get_lib() is not None and not isinstance(labels, LabelBlob):
                    labels = LabelBlob(*make_labels_blob(labels))
            except Exception:
                pass
        writer = None
        if ckpt is None:
            writer = RowWriter(out_fh, labels, pars.extend_out)
            writer.write_header()

        fmt_rw = writer if writer is not None \
            else RowWriter(None, labels, pars.extend_out)

        def pull(bi, blk, dev_out):
            """Stage 1 (tunnel IO): device results -> host numpy. Strip
            groups (blk is None) also compact their rectangle outputs to
            live rows here, so the (pj, a) lexsort and masking overlap
            the next group's device compute."""
            if blk is None:
                k, tiles_j, douts = dev_out
                t0 = time.perf_counter()
                with hold():
                    f, r2p, nit, nu = (np.asarray(x) for x in douts)
                touch()
                log.count_time("sweep: result pull",
                               time.perf_counter() - t0)
                g = len(tiles_j)
                blk2, fm, im = _strip_compact(k, tiles_j, f[:g], r2p[:g],
                                              nit[:g], nu[:g])
                log.count("pairs_emitted", len(blk2.s1))
                return bi, blk2, fm, im
            P = len(blk.s1)
            t0 = time.perf_counter()
            with hold():
                fm, im = np.asarray(dev_out[0])[:P], np.asarray(dev_out[1])[:P]
            touch()
            log.count_time("sweep: result pull", time.perf_counter() - t0)
            return bi, blk, fm, im

        def fmt(bi, blk, fm, im):
            """Stage 2 (CPU): derive stats, format rows to bytes.

            Degenerate pairs (Dp/r2/chi2 denominators ~0 — refine.py) are
            recomputed with the strict pipeline and emit the reference's
            exact values; everything else takes the native derive+format
            fast path."""
            t0 = time.perf_counter()
            n_iter = im[:, 0].astype(np.int32)
            n_used = im[:, 1].astype(np.int32)
            log.count("em_iterations", int(n_iter.astype(np.int64).sum()))
            if pars.verbose >= 2:
                log.hist("em_iteration_histogram",
                         np.bincount(np.clip(n_iter, 0, 100)))
            tiers = (np.zeros(len(fm), np.uint8) if no_refine
                     else degenerate_tiers(fm[:, 1:5], prec))
            t1, t2 = tiers == 1, tiers == 2
            data = None
            if tiers.any():
                # full host derive in the EM dtype (bitwise what the native
                # derive path prints), widened to f64 for the formatter.
                # Tier 1 (exact-zero class) rows take the bit-exact strict
                # recompute; tier 2 (f32-garbage class) takes the fast
                # warm-started f64 polish of the f-derived columns.
                log.count("pairs_refined", int(t1.sum()))
                log.count("pairs_polished", int(t2.sum()))
                r2p, f, n_iter64, n_used64, hmaf0, hmaf1, D, Dp, r2, chi2 \
                    = _unpack(fm, im, pars.extend_out)
                cols = dict(      # copies: fm-backed views are read-only
                    r2p=np.array(r2p, np.float64),
                    f=np.array(f, np.float64),
                    hmaf1=np.array(hmaf0, np.float64),
                    hmaf2=np.array(hmaf1, np.float64),
                    D=np.array(D, np.float64),
                    Dp=np.array(Dp, np.float64),
                    r2=np.array(r2, np.float64),
                    chi2=np.array(chi2, np.float32),
                    maf1=maf[blk.s1].copy(), maf2=maf[blk.s2].copy(),
                    n_iter=np.array(n_iter64, np.int32),
                    n_used=np.array(n_used64, np.int32))
                if t2.any():
                    pol = get_refiner().polish_columns(
                        blk.s1[t2], blk.s2[t2], cols["f"][t2])
                    for k in pol:
                        cols[k][t2] = pol[k]
                if t1.any():
                    ref = get_refiner().refine_columns(blk.s1[t1],
                                                       blk.s2[t1])
                    for k in cols:
                        cols[k][t1] = ref[k]
                data = fmt_rw.format_block(
                    blk.s1, blk.s2, blk.dist, cols["r2p"], cols["D"],
                    cols["Dp"], cols["r2"], n_used=cols["n_used"],
                    maf1=cols["maf1"], maf2=cols["maf2"], hap=cols["f"],
                    hmaf1=cols["hmaf1"], hmaf2=cols["hmaf2"],
                    chi2=cols["chi2"], n_iter=cols["n_iter"])
            elif fmt_rw.native:
                # single native pass: D/D'/r2/hap-MAFs/chi2 derive inside
                # the formatter's worker threads from (r2p, f) directly
                from .native import format_rows_derive
                data = format_rows_derive(
                    fmt_rw.blob, fmt_rw.off, blk.s1, blk.s2, blk.dist,
                    fm[:, 0], fm[:, 1:5], maf[blk.s1], maf[blk.s2],
                    n_used, n_iter, pars.extend_out)
            if data is None:
                r2p, f, n_iter64, n_used64, hmaf0, hmaf1, D, Dp, r2, chi2 \
                    = _unpack(fm, im, pars.extend_out)
                data = fmt_rw.format_block(
                    blk.s1, blk.s2, blk.dist, r2p, D, Dp, r2,
                    n_used=n_used64.astype(np.int32), maf1=maf[blk.s1],
                    maf2=maf[blk.s2], hap=f, hmaf1=hmaf0, hmaf2=hmaf1,
                    chi2=chi2, n_iter=n_iter64.astype(np.int32))
            log.count_time("sweep: format", time.perf_counter() - t0)
            return bi, data

        def write(bi, data):
            """Stage 3 (disk IO): write rows (or a checkpoint shard)."""
            t0 = time.perf_counter()
            if ckpt is not None:
                with ckpt.open_block(bi) as bfh:
                    bfh.write(data)
                ckpt.commit_block(bi)
            else:
                try:
                    out_fh.write(data)
                except TypeError:
                    out_fh.write(data.decode())
            log.count_time("sweep: write", time.perf_counter() - t0)

        from .utils.signals import GracefulStop

        # Opt-in dense fast path (NGSLD_BLOCK_STRIP=1): sweep the banded
        # plan as strip-tile rectangles (kernels/pallas_strip) instead of
        # gathered pair blocks — no gathers/transposes/sorting; dead
        # out-of-band lanes are masked from iteration 0. Worth it when
        # the plan is dense over rectangles; the gather path stays the
        # default and handles sampling/sharding (see PERF.md).
        strip_mode = False
        if (os.environ.get("NGSLD_BLOCK_STRIP") == "1"
                and pars.rnd_sample >= 1.0 and n_shards == 1
                and getattr(pars, "shard_ind", 1) == 1
                and ckpt is None):
            from .kernels.pallas_strip import (TA as _TA, TB as _TB,
                                               strip_em, strip_tables,
                                               vmem_ok as _svok)
            from .plan.band import band_limits as _bl
            from .plan.band import contig_positions as _cp
            from .plan.strips import strip_plan
            if _svok(pars.n_ind):
                hi_b = _bl(pos_dist, pars.max_kb_dist, pars.max_snp_dist)
                ok_b = ~(maf < pars.min_maf)
                Sp_b = -(-pars.n_sites // _TA) * _TA
                hi_p = np.zeros(Sp_b, np.int32)
                hi_p[:pars.n_sites] = hi_b
                ok_p = np.zeros(Sp_b, np.float32)
                ok_p[:pars.n_sites] = ok_b
                s_ta, s_tb, s_groups, s_util = strip_plan(
                    hi_p, ok_p, pars.n_sites)
                strip_mode = len(s_ta) > 0
                if strip_mode:
                    contig_b, pos_b = _cp(pos_dist)
                    with log.phase("strip tables (device)"), hold():
                        padfn = jax.jit(lambda g, e: strip_tables(
                            jnp.pad(g, ((0, Sp_b - pars.n_sites), (0, 0),
                                        (0, 0)),
                                    constant_values=1.0 / 3.0),
                            jnp.pad(e, ((0, Sp_b - pars.n_sites),
                                        (0, 0))), pars.n_ind))
                        s_ga, s_gb, s_ea, s_eb = padfn(gn_d, eg_d)
                    touch()
                    s_maf = jnp.asarray(
                        np.pad(np.asarray(maf, np.float32),
                               (0, Sp_b - pars.n_sites),
                               constant_values=0.5))
                    s_lo = jnp.asarray(
                        np.arange(Sp_b, dtype=np.int32) + 1)
                    s_hi = jnp.asarray(hi_p)
                    s_ok = jnp.asarray(ok_p)
                    # per-dispatch tile count: every anchor-tile group
                    # pads to the max group size (one compiled shape);
                    # pad tiles repeat (k, k) and are sliced off
                    s_gmax = int(s_groups.max())
                    log.log(2, f"==> strip sweep: {len(s_ta)} tiles, "
                               f"group<= {s_gmax}, util {s_util:.2f}")

        def _strip_compact(k, tiles_j, f, r2p, nit, nu):
            """Mask one anchor-tile group's (g, ...) outputs to live rows
            in (s1, s2) order; returns (blk, fm, im)."""
            parts = []
            for gidx, j in enumerate(tiles_j):
                A = (k * _TA + np.arange(_TA, dtype=np.int64))[:, None]
                PJ = (j * _TB + np.arange(_TB, dtype=np.int64))[None, :]
                valid = (PJ > A) & (PJ < pars.n_sites) & (A < pars.n_sites)
                valid &= (ok_p[np.minimum(A, Sp_b - 1)] > 0) \
                    & (ok_p[np.minimum(PJ, Sp_b - 1)] > 0)
                valid &= PJ < hi_p[np.minimum(A, Sp_b - 1)]
                if not valid.any():
                    continue
                parts.append((
                    np.broadcast_to(A, valid.shape)[valid],
                    np.broadcast_to(PJ, valid.shape)[valid],
                    r2p[gidx][valid], f[gidx].transpose(1, 2, 0)[valid],
                    nit[gidx][valid], nu[gidx][valid]))
            if not parts:
                from .plan.band import PairBlock
                z = np.empty(0, np.int64)
                return (PairBlock(s1=z, s2=z, dist=np.empty(0)),
                        np.empty((0, 5), np.float32),
                        np.empty((0, 2), np.int32))
            a = np.concatenate([p[0] for p in parts])
            pj = np.concatenate([p[1] for p in parts])
            order = np.lexsort((pj, a))
            a, pj = a[order], pj[order]
            r2pc = np.concatenate([p[2] for p in parts])[order]
            fc = np.concatenate([p[3] for p in parts])[order]
            fm = np.concatenate([r2pc[:, None], fc], axis=1)
            im = np.stack([np.concatenate([p[4] for p in parts])[order],
                           np.concatenate([p[5] for p in parts])[order]],
                          axis=1)
            from .plan.band import PairBlock
            dist = np.where(contig_b[a] == contig_b[pj],
                            pos_b[pj] - pos_b[a], np.inf)
            return PairBlock(s1=a, s2=pj, dist=dist), fm, im

        n_blocks = 0
        interrupted = False
        # 3-stage emit pipeline on daemon threads: result pull (tunnel IO),
        # stat derivation + row formatting (CPU), file write (disk IO). All
        # three release the GIL for their heavy part, so they overlap each
        # other AND the main thread's dispatch even on one core. FIFO
        # queues keep rows in (s1, s2) order.
        import queue as _queue
        import threading
        emit_q = _queue.Queue(maxsize=3)   # main -> pull
        fmt_q = _queue.Queue(maxsize=2)    # pull -> fmt
        write_q = _queue.Queue(maxsize=2)  # fmt -> write
        emit_err = []

        def _stage(in_q, out_q, fn, name):
            def run():
                while True:
                    item = in_q.get()
                    if item is None:
                        if out_q is not None:
                            out_q.put(None)
                        return
                    try:
                        res = fn(*item)
                    except BaseException as e:
                        emit_err.append(e)
                        while in_q.get() is not None:  # unblock the producer
                            pass
                        if out_q is not None:
                            out_q.put(None)
                        return
                    if out_q is not None:
                        out_q.put(res)
            t = threading.Thread(target=run, daemon=True, name=name)
            t.start()
            return t

        stages = [_stage(emit_q, fmt_q, pull, "ngsld-pull"),
                  _stage(fmt_q, write_q, fmt, "ngsld-fmt"),
                  _stage(write_q, None, write, "ngsld-write")]
        with log.phase("compute: banded pair sweep"), GracefulStop(log) as gs:
            if strip_mode:
                try:
                    interp = jax.default_backend() != "tpu"
                    ti = bi = 0
                    for k, gsz in enumerate(s_groups):
                        gsz = int(gsz)
                        if gsz == 0:
                            continue
                        tiles_j = s_tb[ti:ti + gsz]
                        ti += gsz
                        if gs.stopped or emit_err:
                            interrupted = not emit_err
                            break
                        log.count("blocks_computed")
                        ta_pad = jnp.asarray(
                            np.full(s_gmax, k, np.int32))
                        tb_pad = jnp.asarray(np.concatenate(
                            [tiles_j,
                             np.full(s_gmax - gsz, k, np.int32)]))
                        t0 = time.perf_counter()
                        with hold():
                            outs = strip_em(
                                s_ga, s_gb, s_ea, s_eb, s_maf, s_maf,
                                s_lo, s_hi, s_ok, s_ok, ta_pad, tb_pad,
                                n_ind=pars.n_ind,
                                ignore_miss=pars.ignore_miss_data,
                                interpret=interp)
                        touch()
                        log.count_time("sweep: dispatch",
                                       time.perf_counter() - t0)
                        emit_q.put((bi, None, (k, tiles_j, outs)))
                        bi += 1
                    n_blocks = bi
                finally:
                    emit_q.put(None)
                    for t in stages:
                        t.join()
                if emit_err:
                    raise emit_err[0]
                if interrupted:
                    log.log(0, "==> Interrupted mid strip sweep.")
                    raise SystemExit(130)
                log.summary()
                return
            blocks_it = enumerate(_prefetch_blocks(
                iter_pair_blocks(pars, maf, pos_dist, block_pairs=chunk)))
            try:
                while True:
                    t_top = time.perf_counter()
                    try:
                        bi, blk = next(blocks_it)
                    except StopIteration:
                        break
                    log.count_time("sweep: plan wait",
                                   time.perf_counter() - t_top)
                    n_blocks = bi + 1
                    if gs.stopped or emit_err:
                        interrupted = not emit_err
                        break
                    if ckpt is not None and ckpt.done(bi):
                        log.count("blocks_resumed")
                        continue
                    P = len(blk.s1)
                    log.count("pairs_emitted", P)
                    log.count("blocks_computed")
                    if pars.verbose >= 3:
                        log.log(3, f"> Block {bi}: anchors "
                                   f"{blk.s1[0]}..{blk.s1[-1]}, {P} pairs")
                    # pad to a multiple of 16K*n_shards (tail blocks and
                    # sampling variance then hit a few compiled shapes, and
                    # padding stays <= 12% instead of up to 2x with pow2)
                    quantum = 16384 * n_shards
                    pad = -P % quantum
                    s1 = np.concatenate([blk.s1, np.zeros(pad, np.int64)])
                    s2 = np.concatenate([blk.s2, np.ones(pad, np.int64)
                                         * min(1, pars.n_sites - 1)])
                    t0 = time.perf_counter()
                    s1j = (jnp.asarray(s1, jnp.int32) if idx_shd is None
                           else jax.device_put(s1.astype(np.int32),
                                               idx_shd))
                    s2j = (jnp.asarray(s2, jnp.int32) if idx_shd is None
                           else jax.device_put(s2.astype(np.int32),
                                               idx_shd))
                    with hold():
                        dev_out = compute(gn_d, eg_d, maf_d, s1j,
                                          s2j)  # async
                    touch()
                    log.count_time("sweep: dispatch",
                                   time.perf_counter() - t0)
                    emit_q.put((bi, blk, dev_out))
            finally:
                # always shut the pipeline down, even when the loop raises
                # (device OOM, plan error): daemon stages blocked on get()
                # would otherwise pin queued device buffers forever
                emit_q.put(None)
                for t in stages:
                    t.join()
            if emit_err:
                raise emit_err[0]

        if interrupted:
            hint = (f"resume with the same --checkpoint {ckpt.dir}"
                    if ckpt is not None else
                    "rerun with --checkpoint DIR to make runs resumable")
            log.log(0, f"==> Interrupted before block {n_blocks - 1}; "
                       f"completed blocks are flushed. {hint}")
            raise SystemExit(130)

        if ckpt is not None:
            with log.phase("Merging checkpoint shards"):
                hdr = strict.header_line(pars.extend_out)
                out_fh.write(hdr if hasattr(out_fh, "encoding")
                             else hdr.encode())
                ckpt.concatenate(out_fh, n_blocks)
        log.summary()
    finally:
        if profile_dir:
            jax.profiler.stop_trace()
