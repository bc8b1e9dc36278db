"""Offline strip-kernel check-schedule optimizer (r4, VERDICT item 3).

Consumes /tmp/strip_nit.npz (dev/exp_nit.py) and evaluates candidate
convergence-check schedules against the REAL per-pair nIter distribution:
a group of G anchors x TB lanes executes to the first checkpoint >= its
max lane nIter, so

    executed(schedule) = sum_groups ceil_to_checkpoint(max nIter in group)
    counted            = sum_pairs nIter

throughput_counted ~= ceiling * counted / executed - sync_overhead*checks.
This finds (G, U1, U2) worth measuring on the chip without burning chip
time per candidate. U1 = first check (fori prefix), U2 = stride after.
"""
import numpy as np

d = np.load("/tmp/strip_nit.npz")
nit = d["nit"]          # 0-based converged iter; iter_cap when unconverged
sel, TA, TB = d["sel"], int(d["TA"]), int(d["TB"])
CAP = 100

# counted iterations per pair (the exp_strip counting convention)
cnt = nit.astype(np.int64) + 1
counted = cnt.sum()
slot = sel // (TA * TB)
a_loc = (sel % (TA * TB)) // TB

print(f"pairs={len(nit)} counted={counted} mean={cnt.mean():.1f} "
      f"p50={np.percentile(cnt,50):.0f} p90={np.percentile(cnt,90):.0f} "
      f"p99={np.percentile(cnt,99):.0f} max={cnt.max()}")


def executed(G, U1, U2):
    """Total executed lane-iterations + number of convergence checks."""
    grp = slot * (TA // G) + a_loc // G
    gmax = np.zeros(grp.max() + 1, np.int64)
    np.maximum.at(gmax, grp, cnt)
    # checkpoints: U1, U1+U2, U1+2*U2, ... capped at >= CAP
    n_steps = np.where(gmax <= U1, 0, (gmax - U1 + U2 - 1) // U2)
    stop = np.minimum(U1 + n_steps * U2, ((CAP + U2 - 1) // U2) * U2)
    lanes = G * TB
    return (stop.sum() * lanes, (1 + n_steps).sum())


base_ex, base_ck = executed(2, 10, 10)   # current default
print(f"\ncurrent (G=2, U=10): counted/executed = "
      f"{counted / (base_ex / TB / 2 * 2 * TB):.3f}"
      f"  executed={base_ex} checks={base_ck}")

rows = []
for G in (1, 2, 4):
    for U1 in (6, 8, 10, 12, 14, 16, 20):
        for U2 in (2, 3, 4, 5, 6, 8, 10):
            ex, ck = executed(G, U1, U2)
            rows.append((ex, ck, G, U1, U2))
rows.sort()
print("\n ex_rel  checks_rel  G U1 U2   (sorted by executed lane-iters)")
for ex, ck, G, U1, U2 in rows[:20]:
    print(f" {ex/base_ex:6.3f}  {ck/base_ck:8.3f}  {G} {U1:2d} {U2:2d}")

# how much of the gap is granularity at all? perfect per-lane exit:
ideal = cnt.sum()  # every lane stops exactly at its nIter
# but dead lanes in a live group still execute: account group live counts
grp2 = slot * (TA // 2) + a_loc // 2
lanes_per_group = 2 * TB
gmax2 = np.zeros(grp2.max() + 1, np.int64)
np.maximum.at(gmax2, grp2, cnt)
print(f"\nexecuted @ per-lane-perfect: {ideal}  "
      f"(= {ideal/base_ex:.3f} of current executed)")
print(f"counted/executed current: {counted/base_ex:.3f}")
