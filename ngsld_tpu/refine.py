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

    want = {int(s): j for j, s in enumerate(sites)}
    out = np.empty((len(sites), m, 3), np.float64)
    found = 0
    n = pars.n_sites
    CHUNK = 16 << 20
    with strict.open_maybe_gz(pars.in_geno, "rb") as fh:
        carry = b""
        s = 0
        while found < len(want):
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
                k = want.get(s + j)
                if k is not None:
                    out[k] = recs[j]
                    found += 1
            s += len(recs)
            if eof:
                break
    if found < len(want):
        raise strict.StrictError(
            "read_geno", "GENO file at premature EOF. "
            "Check GENO file and number of sites!")
    return out


def knife_edge_sites(maf: np.ndarray, min_maf: float, prec: str) -> np.ndarray:
    """Site indices whose device MAF is too close to min_maf to trust the
    `maf < min_maf` plan decision at the engine's precision."""
    if min_maf <= 0:
        return np.empty(0, np.int64)
    tol = 1e-4 if prec == "f32" else 1e-11
    with np.errstate(invalid="ignore"):
        return np.flatnonzero(np.abs(maf - min_maf) <= tol)


def degenerate_mask(f: np.ndarray, extra_nonfinite=()) -> np.ndarray:
    """Pairs whose Dp/r2/chi2 denominators are numerically fragile: tiny
    haplotype-frequency products amplify the EM's ~EPSILON wobble into
    visible output differences (reference formulas: ngsLD.cpp:295-349).

    f: (P, 4) haplotype frequencies (any float dtype). extra_nonfinite:
    already-derived stat columns — any nonfinite value there flags too."""
    f = np.asarray(f, np.float64)
    with np.errstate(all="ignore"):
        maf0 = 1.0 - (f[:, 0] + f[:, 1])
        maf1 = 1.0 - (f[:, 0] + f[:, 2])
        D = f[:, 0] * f[:, 3] - f[:, 1] * f[:, 2]
        neg = -np.minimum(maf0 * maf1, (1 - maf0) * (1 - maf1))
        pos = np.minimum(maf0 * (1 - maf1), (1 - maf0) * maf1)
        den_dp = np.where(D < 0, neg, pos)
        den_r2 = maf0 * maf1 * (1 - maf0) * (1 - maf1)
        bad = (np.abs(den_dp) < 1e-3) | (np.abs(den_r2) < 1e-6) \
            | (np.abs(D) < 1e-6)
        bad |= ~np.isfinite(f).all(axis=1)
        for col in extra_nonfinite:
            bad |= ~np.isfinite(np.asarray(col, np.float64))
    return bad


class StrictRefiner:
    """Recompute flagged sites/pairs with the strict pipeline; caches the
    per-site state (rows, called genotypes, MAF, E[G]) so repeated blocks
    touching the same fragile sites pay the file read once."""

    def __init__(self, pars):
        self.pars = pars
        self._gn = {}    # site -> (n_ind, 3) f64 NORMAL-space (post-call)
        self._eg = {}    # site -> (n_ind,) expected genotypes
        self._maf = {}   # site -> f64 strict MAF

    def _ensure(self, sites) -> None:
        missing = sorted({int(s) for s in sites} - self._maf.keys())
        if not missing:
            return
        rows = load_gl_rows(self.pars, np.asarray(missing, np.int64))
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
        f, n_iter, n_used = strict.pair_em_batch(
            gn1, gn2, maf1, maf2, self.pars.ignore_miss_data)
        hmaf0, hmaf1, D, Dp, r2 = strict.ld_stats_batch(f)
        chi2 = strict.chi2_batch(f)
        return dict(r2p=r2p, f=f, n_iter=n_iter, n_used=n_used,
                    maf1=maf1, maf2=maf2, hmaf1=hmaf0, hmaf2=hmaf1,
                    D=D, Dp=Dp, r2=r2, chi2=chi2)
