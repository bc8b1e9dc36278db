"""Rectangle (strip-tile) decomposition of a banded pair plan.

Covers every in-band pair (a, b in (a, hi[a])) with TA x TB tiles whose
coordinates feed kernels.pallas_strip.strip_em: anchor tile k spans
sites [k*TA, (k+1)*TA); its partner tiles j run from k (the triangle
starts inside the diagonal tile) to the last tile touched by the
block's furthest band reach. Tiles are ordered (k asc, j asc), so one
anchor tile's rows interleave back into global (s1, s2) order with a
single (pj, a) lexsort per anchor-tile group (engine strip sweep).

The decomposition is only worth dispatching when the plan is DENSE over
the rectangles — `utilization` reports live-pairs/cells so the engine
can fall back to the gather path for sparse bands (PERF.md).
"""

from __future__ import annotations

import numpy as np

from ..kernels.pallas_strip import TA, TB


def strip_plan(hi: np.ndarray, ok: np.ndarray, n_sites: int):
    """(ta, tb, groups, utilization): tile coordinate arrays (int32, in
    TA/TB units over the padded site range), per-anchor-tile group sizes
    (#partner tiles for each k, in tile-list order), and the live-cell
    fraction. hi/ok are over the PADDED range (ok False on pad sites)."""
    Sp = len(hi)
    assert Sp % TA == 0
    ta, tb, groups = [], [], []
    for k in range(Sp // TA):
        lo_s, hi_s = k * TA, (k + 1) * TA
        seg_ok = ok[lo_s:hi_s].astype(bool)
        if not seg_ok.any():
            groups.append(0)
            continue
        reach = int(hi[lo_s:hi_s][seg_ok].max(initial=0))
        j_end = max(k + 1, -(-reach // TB))
        groups.append(j_end - k)
        for j in range(k, j_end):
            ta.append(k)
            tb.append(j)
    ta = np.asarray(ta, np.int32)
    tb = np.asarray(tb, np.int32)
    a = np.arange(Sp)
    live = int(np.maximum(np.minimum(hi, Sp) - a - 1, 0)[ok.astype(bool)]
               .sum())
    cells = max(1, len(ta) * TA * TB)
    return ta, tb, np.asarray(groups, np.int64), live / cells

