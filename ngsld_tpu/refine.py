"""Host-side strict (f64, reference-exact) repair of numerically fragile
results — the f32-hardening layer of the JAX engine.

Two failure modes of the fast device path are repaired here:

1. **Pair-set stability** (`knife_edge_sites` + `StrictRefiner.exact_maf`):
   the banded plan's `maf < min_maf` filter (ngsLD.cpp:264,270) consumes
   device-computed MAFs. In f32 mode a knife-edge site can round to the
   other side of min_maf than the reference's f64 value, silently
   adding/removing whole anchor bands. Sites within a tolerance of the
   threshold get their MAF recomputed with the bit-exact strict estimator
   (strict.est_maf_all), so the pair SET always matches the reference.

2. **Degenerate LD statistics** (`degenerate_mask` +
   `StrictRefiner.refine_columns`): Dp, r2 and chi2 divide by haplotype-
   frequency products that can be ~0 (monomorphic-ish sites, D ~ 0). A
   ~1e-6 EM wobble then moves the printed value arbitrarily (or flips
   inf/nan vs finite). Flagged pairs are recomputed end-to-end with the
   strict pipeline (read rows -> call_geno -> est_maf -> EM -> stats), so
   their emitted values are byte-exact with the reference's.

Only the NEEDED site rows are re-read from the GENO file (binary: direct
seeks; gz-text: one streaming parse keeping the wanted rows), so the cost
is O(flagged), not O(table).
"""

from __future__ import annotations

import math
import os

import numpy as np

from . import strict


def load_gl_rows(pars, sites: np.ndarray) -> np.ndarray:
    """(len(sites), n_ind, 3) f64 log-normalized GL rows for the given
    GLOBAL site indices — bit-identical to strict.read_geno(...)[sites].

    Binary input seeks straight to each record (read_data.cpp:28-47
    semantics per row); text input streams the native chunk parser (the
    same code path as ngsld_read_geno_text) once, keeping only the wanted
    rows. Falls back to a full strict.read_geno when neither fast path
    applies (native lib unavailable)."""
    sites = np.asarray(sites, np.int64)
    m = pars.n_ind
    if pars.in_bin:
        rec = m * 3
        out = np.empty((len(sites), m, 3), np.float64)
        with open(pars.in_geno, "rb") as fh:
            for j, s in enumerate(sites):
                fh.seek(int(s) * rec * 8)
                raw = np.fromfile(fh, np.float64, rec).reshape(m, 3)
                for i in range(m):
                    g = [float(raw[i, 0]), float(raw[i, 1]),
                         float(raw[i, 2])]
                    if not pars.in_logscale:
                        # conv_space(log) with -inf -> -INF clamp
                        # (read_data.cpp:38, gen_func.cpp:125-132)
                        g = [strict._NEG_INF_SENTINEL
                             if strict._libm_log1(v) == -math.inf
                             else strict._libm_log1(v) for v in g]
                    g = strict.post_prob3(g)
                    if any(math.isnan(v) for v in g):
                        raise strict.StrictError(
                            "read_geno",
                            "NaN found! Is the file format correct?")
                    out[j, i] = g
        return out

    use_native = os.environ.get("NGSLD_NO_NATIVE") != "1"
    if use_native:
        try:
            from .native import get_lib, parse_geno_text_native
            use_native = get_lib() is not None
        except Exception:
            use_native = False
    if not use_native:
        table = strict.read_geno(pars.in_geno, pars.in_bin, pars.in_probs,
                                 pars.in_logscale, m, pars.n_sites)
        return np.asarray(table, np.float64)[sites].copy()

    want = {}          # site -> ALL output slots (duplicates honored,
    for j, s in enumerate(sites):   # like the binary branch above)
        want.setdefault(int(s), []).append(j)
    out = np.empty((len(sites), m, 3), np.float64)
    found = 0
    n = pars.n_sites
    CHUNK = 16 << 20
    with strict.open_maybe_gz(pars.in_geno, "rb") as fh:
        carry = b""
        s = 0
        while found < len(sites):
            data = fh.read(CHUNK)
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
                break
            recs, _used = parse_geno_text_native(
                chunk, pars.in_probs, pars.in_logscale, m, s,
                min(chunk.count(b"\n"), n - s))
            for j in range(len(recs)):
                for k in want.get(s + j, ()):
                    out[k] = recs[j]
                    found += 1
            s += len(recs)
            if eof:
                break
    if found < len(sites):
        raise strict.StrictError(
            "read_geno", "GENO file at premature EOF. "
            "Check GENO file and number of sites!")
    return out


def read_binary_raw_rows(pars, sites: np.ndarray) -> np.ndarray:
    """RAW (un-normalized) f64 records for the given sites from a binary
    GENO file, via ascending seeks (shared by the fast loader and the
    native siteprep feeder)."""
    sites = np.asarray(sites, np.int64)
    m = pars.n_ind
    rec = m * 3
    raw = np.empty((len(sites), m, 3), np.float64)
    order = np.argsort(sites, kind="stable")
    with open(pars.in_geno, "rb") as fh:
        for j in order:
            fh.seek(int(sites[j]) * rec * 8)
            raw[j] = np.fromfile(fh, np.float64, rec).reshape(m, 3)
    return raw


def load_gl_rows_fast(pars, sites: np.ndarray) -> np.ndarray:
    """Vectorized f64 variant of load_gl_rows for the POLISH path: same
    record semantics (optional log with the -INF clamp, log-softmax
    normalize) via numpy ufuncs instead of the strict reader's per-element
    libm pinning — values agree with strict to ~1e-16, which is all the
    f64 polish needs. Binary input only (sorted seeks); text falls back
    to the bit-exact loader."""
    if not pars.in_bin:
        return load_gl_rows(pars, sites)
    raw = read_binary_raw_rows(pars, np.asarray(sites, np.int64))
    with np.errstate(all="ignore"):
        if not pars.in_logscale:
            lg = np.log(raw)
            raw = np.where(np.isneginf(lg), strict._NEG_INF_SENTINEL, lg)
        mx = np.max(raw, axis=-1, keepdims=True)
        mx = np.where(np.isfinite(mx), mx, 0.0)
        norm = np.log(np.sum(np.exp(raw - mx), axis=-1, keepdims=True)) + mx
        return raw - norm


def knife_edge_sites(maf: np.ndarray, min_maf: float, prec: str) -> np.ndarray:
    """Site indices whose device MAF is too close to min_maf to trust the
    `maf < min_maf` plan decision at the engine's precision.

    Tolerance derivation (pinned by
    tests/test_refine.py::test_knife_edge_tolerance_bounds_measured_f32_error):
    the closed-form MAF is mean(E[G])/2 with each f32 posterior carrying
    ~2^-24 relative error; XLA reduces the individual axis as a tree, so
    the mean accumulates O(log I) ulps, keeping the absolute error ~1e-6
    even at I = 5000 (measured worst case across depth/error regimes:
    < 1e-5). The f32 band of 1e-4 therefore bounds the real error with
    >= 10x margin — a site farther than tol from min_maf can never flip
    the plan decision (ngsLD.cpp:264,270) — while flagging only
    O(tol * n_sites) sites for the strict recompute. f64 analogously:
    ~2^-53 per-element error, 1e-11 band."""
    if min_maf <= 0:
        return np.empty(0, np.int64)
    tol = 1e-4 if prec == "f32" else 1e-11
    with np.errstate(invalid="ignore"):
        return np.flatnonzero(np.abs(maf - min_maf) <= tol)


def degenerate_tiers(f: np.ndarray, prec: str,
                     extra_nonfinite=()) -> np.ndarray:
    """Classify pairs by how numerically fragile their Dp/r2/chi2 are
    (reference formulas: ngsLD.cpp:295-349). Returns (P,) uint8:

    0 — healthy: the fast path's values are within the precision
        contract (~1e-12 f64 / ~1e-4 f32 of strict).

    Threshold derivation: both engines stop the EM at max-abs update
    < EPSILON = 1e-5 (gen_func.hpp:16), which makes ~1e-5 the f
    divergence floor between ANY two implementations (measured f32-vs-
    f64 converged |Δf| < 5e-5; pinned by tests/test_refine.py::
    test_tier2_band_bounds_measured_f32_em_wobble). Dp/r2 divide by
    denominator products of f-sums, so a denominator below ~1e-4 lets
    that wobble move the printed value by O(0.1+) — the tier-2 band.
    Denominators below ~1e-7 (or |D| within wobble of 0, whose sign
    picks the Dp branch) are indistinguishable from exact zero at the
    shared stop tolerance — strict's value there is inf/nan or branch-
    dependent, so only the bit-exact recompute reproduces it (tier 1).
    1 — exact-zero class: a denominator at (or within f64 wobble of)
        exactly 0, a D whose sign could flip branches, or nonfinite
        output. Strict's value is inf/nan or branch-dependent, so these
        get the full bit-exact strict recompute in BOTH precisions.
    2 — f32-garbage class (flagged only when prec == 'f32'): the
        denominator is small enough (< ~1e-4) that the f32 EM's ~1e-5
        wobble moves Dp/r2 by O(0.1+). A fast f64 polish (warm-started
        from the f32 frequencies) repairs the VALUE columns; f64 math
        is accurate here, so no strict recompute is needed.

    f: (P, 4) haplotype frequencies (any float dtype); extra_nonfinite:
    already-derived stat columns — nonfinite values there force tier 1.
    """
    f = np.asarray(f, np.float64)
    with np.errstate(all="ignore"):
        maf0 = 1.0 - (f[:, 0] + f[:, 1])
        maf1 = 1.0 - (f[:, 0] + f[:, 2])
        D = f[:, 0] * f[:, 3] - f[:, 1] * f[:, 2]
        neg = -np.minimum(maf0 * maf1, (1 - maf0) * (1 - maf1))
        pos = np.minimum(maf0 * (1 - maf1), (1 - maf0) * maf1)
        den_dp = np.where(D < 0, neg, pos)
        den_r2 = maf0 * maf1 * (1 - maf0) * (1 - maf1)
        tier = np.zeros(len(f), np.uint8)
        nonfin = ~np.isfinite(f).all(axis=1)
        for col in extra_nonfinite:
            nonfin |= ~np.isfinite(np.asarray(col, np.float64))
        if prec == "f32":
            # f32-garbage band: the f64 polish restores f64-engine grade
            # (the shared 1e-5 EM stop tolerance remains the floor). The
            # band extends to 1e-3 — the f32 EM's ~5e-5 wobble still
            # moves Dp by ~5e-2 at den = 1e-3, and the fuzz comparator's
            # fragile cutoff sits there, so every denominator range is
            # either repaired or asserted (VERDICT r3 item 5; bound
            # pinned by tests/test_refine.py::
            # test_polished_band_bound_vs_strict).
            tier[(np.abs(den_dp) < 1e-3) | (np.abs(den_r2) < 1e-6)
                 | (np.abs(D) < 2e-6)] = 2
        # exact-zero class, BOTH precisions: strict's value is inf/nan or
        # branch-dependent — only the bit-exact recompute matches it.
        # D == 0 with a healthy denominator is a STABLE 0.000000
        # everywhere and stays fast.
        tier[(np.abs(den_dp) < 1e-7) | (np.abs(den_r2) < 1e-13)
             | nonfin] = 1
    return tier


def degenerate_mask(f: np.ndarray, prec: str = "f64",
                    extra_nonfinite=()) -> np.ndarray:
    """Any-tier flag (see degenerate_tiers)."""
    return degenerate_tiers(f, prec, extra_nonfinite) > 0


def _fast_em_f64(gn1, gn2, f0, include):
    """Vectorized f64 EM polish: same update as the reference EM
    (gen_func.cpp:1076-1119) with batched per-pair freeze, warm-started
    from the engine's f32 frequencies and stopped at the reference's own
    EPSILON — i.e. exactly the f64 engine's quality. On near-degenerate
    pairs the printed Dp/r2 depend on WHERE the EM trajectory stops
    (Dp -> 1 as pinned coordinates decay; the shared 1e-5 stop rule puts
    any two implementations within ~1e-5/den of each other, PERF.md), so
    this is the best any non-bit-exact method can do; the exact-zero
    tier goes through the strict recompute instead. gn (k, I, 3) f64
    normal GLs; f0 (k, 4); include (k, I) bool. Returns f (k, 4)."""
    from .constants import EPSILON, ITER_MAX
    k, I, _ = gn1.shape
    incf = include.astype(np.float64)
    x = incf.sum(axis=1)
    invx = np.where(x > 0, 1.0 / np.maximum(x, 1), np.inf)
    f = np.array(f0, np.float64)
    active = np.ones(k, bool)
    with np.errstate(all="ignore"):
        for _ in range(ITER_MAX):
            fa = f[active]
            g1, g2 = gn1[active], gn2[active]
            # D_k[i] = sum_{da,db} f[2da+db] g1[da+a1k] g2[db+a2k]
            Q0 = fa[:, 0:1, None] * g2[:, :, 0:2] \
                + fa[:, 1:2, None] * g2[:, :, 1:3]      # (k, I, 2)
            Q1 = fa[:, 2:3, None] * g2[:, :, 0:2] \
                + fa[:, 3:4, None] * g2[:, :, 1:3]
            D = np.empty((len(fa), I, 4))
            D[..., 0] = g1[:, :, 0] * Q0[..., 0] + g1[:, :, 1] * Q1[..., 0]
            D[..., 1] = g1[:, :, 0] * Q0[..., 1] + g1[:, :, 1] * Q1[..., 1]
            D[..., 2] = g1[:, :, 1] * Q0[..., 0] + g1[:, :, 2] * Q1[..., 0]
            D[..., 3] = g1[:, :, 1] * Q0[..., 1] + g1[:, :, 2] * Q1[..., 1]
            s = np.einsum("kic,kc->ki", D, fa)
            r = incf[active] / s
            fn = fa * np.einsum("kic,ki->kc", D, r) \
                * invx[active][:, None]
            fn /= fn.sum(axis=1, keepdims=True)
            eps = np.abs(fn - fa).max(axis=1)
            f[active] = fn
            sub = eps >= EPSILON        # still-active within the subset
            if not sub.any():
                break
            idx = np.flatnonzero(active)
            active[idx[~sub]] = False
    return f


class StrictRefiner:
    """Recompute flagged sites/pairs with the strict pipeline; caches the
    per-site state (rows, called genotypes, MAF, E[G]) so repeated blocks
    touching the same fragile sites pay the file read once."""

    def __init__(self, pars):
        self.pars = pars
        self._gn = {}    # site -> (n_ind, 3) f64 NORMAL-space (post-call)
        self._eg = {}    # site -> (n_ind,) expected genotypes
        self._maf = {}   # site -> f64 strict MAF
        self._gnf = {}   # site -> fast-loaded rows (polish path)

    def _ensure_rows_fast(self, sites) -> None:
        missing = sorted({int(s) for s in sites} - self._gnf.keys())
        if not missing:
            return
        rows = load_gl_rows_fast(self.pars, np.asarray(missing, np.int64))
        if self.pars.call_geno:
            strict.call_geno_inplace(rows, self.pars.N_thresh,
                                     self.pars.call_thresh)
        gn = np.exp(rows)
        for j, s in enumerate(missing):
            self._gnf[s] = gn[j]

    def _ensure(self, sites) -> None:
        missing = sorted({int(s) for s in sites} - self._maf.keys())
        if not missing:
            return
        arr = np.asarray(missing, np.int64)
        # native fast path: raw rows + the whole strict site pipeline
        # (post_prob/call_geno/est_maf/E[G]) in C, bit-identical to the
        # Python strict path (ngsld_strict_siteprep)
        done = False
        if os.environ.get("NGSLD_NO_NATIVE") != "1":
            try:
                from .native import strict_siteprep_native
                raw, text_norm = self._read_raw_rows(arr)
                if raw is not None:
                    out = strict_siteprep_native(
                        raw, self.pars.in_logscale, text_norm,
                        self.pars.call_geno, self.pars.N_thresh,
                        self.pars.call_thresh, self.pars.ignore_miss_data)
                    if out is not None:
                        gn, maf, eg = out
                        done = True
            except ImportError:
                pass
        if not done:
            rows = load_gl_rows(self.pars, arr)
            if self.pars.call_geno:
                strict.call_geno_inplace(rows, self.pars.N_thresh,
                                         self.pars.call_thresh)
            maf = strict.est_maf_all(rows, self.pars.ignore_miss_data)
            gn = strict.libm_exp(rows)
            eg = gn[:, :, 1] + 2 * gn[:, :, 2]
        for j, s in enumerate(missing):
            self._gn[s] = gn[j]
            self._eg[s] = eg[j]
            self._maf[s] = float(maf[j])

    def _read_raw_rows(self, sites):
        """(rows, text_norm) for the native siteprep: binary input reads
        RAW records via seeks (C applies log/post_prob); text input uses
        the native chunk parser (rows arrive log-normalized). (None,
        False) when no fast source applies."""
        pars = self.pars
        if pars.in_bin:
            return read_binary_raw_rows(pars, sites), False
        try:
            from .native import get_lib
            if get_lib() is None:
                return None, False
        except Exception:
            return None, False
        return load_gl_rows(pars, sites), True   # native text parse

    def exact_maf(self, sites) -> np.ndarray:
        """Strict (bit-exact) MAF for the given global site indices."""
        self._ensure(sites)
        return np.array([self._maf[int(s)] for s in sites], np.float64)

    def refine_columns(self, s1, s2) -> dict:
        """Strict end-to-end values for the given pairs. Returns f64 (and
        int64/float32 where the contract says so) columns keyed like the
        ring spill: r2p f n_iter n_used maf1 maf2 hmaf1 hmaf2 D Dp r2
        chi2 — each byte-exact with what `--engine strict` would print."""
        s1 = np.asarray(s1, np.int64)
        s2 = np.asarray(s2, np.int64)
        self._ensure(np.concatenate([s1, s2]))
        gn1 = np.stack([self._gn[int(s)] for s in s1])
        gn2 = np.stack([self._gn[int(s)] for s in s2])
        eg1 = np.stack([self._eg[int(s)] for s in s1])
        eg2 = np.stack([self._eg[int(s)] for s in s2])
        maf1 = np.array([self._maf[int(s)] for s in s1])
        maf2 = np.array([self._maf[int(s)] for s in s2])
        r2p = strict.pearson_r2_batch(eg1, eg2)
        em = None
        if os.environ.get("NGSLD_NO_NATIVE") != "1":
            try:
                from .native import strict_pair_em_native
                em = strict_pair_em_native(gn1, gn2, maf1, maf2,
                                           self.pars.ignore_miss_data)
            except ImportError:
                em = None
        if em is None:
            em = strict.pair_em_batch(gn1, gn2, maf1, maf2,
                                      self.pars.ignore_miss_data)
        f, n_iter, n_used = em
        hmaf0, hmaf1, D, Dp, r2 = strict.ld_stats_batch(f)
        chi2 = strict.chi2_batch(f)
        return dict(r2p=r2p, f=f, n_iter=n_iter, n_used=n_used,
                    maf1=maf1, maf2=maf2, hmaf1=hmaf0, hmaf2=hmaf1,
                    D=D, Dp=Dp, r2=r2, chi2=chi2)

    def polish_columns(self, s1, s2, f_warm) -> dict:
        """f64 VALUE repair for tier-2 pairs: rerun the EM in f64 from
        the engine's converged f32 frequencies (a handful of iterations)
        and re-derive the f-dependent columns. Unlike refine_columns this
        is tolerance-grade (~1e-12 of a cold f64 run), not bit-exact —
        exactly the accuracy the fast engine's f64 mode already has —
        and an order of magnitude cheaper than the strict recompute.
        Returns only the f-derived columns: f, hmaf1/2, D, Dp, r2, chi2
        (r2p/maf/nIter/n_used keep the engine's values)."""
        s1 = np.asarray(s1, np.int64)
        s2 = np.asarray(s2, np.int64)
        self._ensure_rows_fast(np.concatenate([s1, s2]))
        gn1 = np.stack([self._gnf[int(s)] for s in s1])
        gn2 = np.stack([self._gnf[int(s)] for s in s2])
        if self.pars.ignore_miss_data:
            include = ~(strict.miss_data_rows(gn1)
                        | strict.miss_data_rows(gn2))
        else:
            include = np.ones(gn1.shape[:2], bool)
        f = None
        if os.environ.get("NGSLD_NO_NATIVE") != "1":
            try:
                # native threaded per-pair EM: the NumPy batch loop below
                # costs ~190 us/pair (per-iteration temporaries + active-
                # set fancy indexing) and dominated dense-panel emission
                from .native import polish_em_native
                f = polish_em_native(gn1, gn2,
                                     np.asarray(f_warm, np.float64),
                                     include)
            except ImportError:
                f = None
        if f is None:
            f = _fast_em_f64(gn1, gn2, np.asarray(f_warm, np.float64),
                             include)
        hmaf0, hmaf1, D, Dp, r2 = strict.ld_stats_batch(f)
        chi2 = strict.chi2_batch(f)
        return dict(f=f, hmaf1=hmaf0, hmaf2=hmaf1, D=D, Dp=Dp, r2=r2,
                    chi2=chi2)
