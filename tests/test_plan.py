"""The vectorized band plan must enumerate exactly the reference's pair set
(including RNG-sampled runs) — verified against strict.enumerate_pairs."""

import numpy as np
import pytest

from ngsld_tpu import strict
from ngsld_tpu.config import Params
from ngsld_tpu.plan.band import iter_pair_blocks
from ngsld_tpu.utils.simulate import simulate


def make_pars(tmp_path, **kw):
    # dummy geno file to satisfy validation
    g = tmp_path / "x.glf"
    n_ind, n_sites = kw.get("n_ind", 8), kw.get("n_sites", 500)
    g.write_bytes(b"\0" * (8 * 3 * n_ind * n_sites))
    base = dict(in_geno=str(g), in_probs=True, in_logscale=True,
                n_ind=n_ind, n_sites=n_sites, in_pos="unused")
    base.update(kw)
    return Params(**base).finalize()


def pos_dist_from_sim(sim):
    import math
    d = np.empty(sim.n_sites)
    prev_chr, prev_pos = None, 0
    for s in range(sim.n_sites):
        if prev_chr == sim.chrom[s]:
            d[s] = sim.pos[s] - prev_pos
        else:
            d[s] = math.inf if prev_chr is not None else sim.pos[s]
        prev_chr, prev_pos = sim.chrom[s], sim.pos[s]
    return d


@pytest.mark.parametrize("kw", [
    dict(max_kb_dist=5, max_snp_dist=0, min_maf=0.0),
    dict(max_kb_dist=3, max_snp_dist=0, min_maf=0.1),
    dict(max_kb_dist=0, max_snp_dist=20, min_maf=0.05),
    dict(max_kb_dist=4, max_snp_dist=10, min_maf=0.05),
    dict(max_kb_dist=0, max_snp_dist=0, min_maf=0.2),   # all-pairs + maf
    dict(max_kb_dist=5, min_maf=0.05, rnd_sample=0.5, seed=12345),
    dict(max_kb_dist=5, min_maf=0.0, rnd_sample=0.11, seed=7),
    dict(max_kb_dist=0, max_snp_dist=13, rnd_sample=0.9, seed=3),
])
def test_plan_matches_strict_walk(tmp_path, kw):
    sim = simulate(n_ind=8, n_sites=500, seed=5, mono_rate=0.05)
    pars = make_pars(tmp_path, seed=kw.pop("seed", 1), **kw)
    pos_dist = pos_dist_from_sim(sim)
    rng = np.random.default_rng(0)
    maf = rng.uniform(0, 0.5, sim.n_sites)
    # NaN MAFs (all-missing sites under --ignore_miss_data) must PASS the
    # min_maf filter, as in the reference's `maf < min_maf -> break`
    maf[rng.random(sim.n_sites) < 0.03] = np.nan

    ref = strict.enumerate_pairs(pars, maf, pos_dist)
    got = []
    for blk in iter_pair_blocks(pars, maf, pos_dist, block_pairs=777):
        got += list(zip(blk.s1.tolist(), blk.s2.tolist(), blk.dist.tolist()))
    assert len(ref) == len(got), f"{len(ref)} vs {len(got)}"
    for (a, b, d), (a2, b2, d2) in zip(ref, got):
        assert (a, b) == (a2, b2)
        assert d == d2 or (np.isinf(d) and np.isinf(d2))
    assert len(ref) > 0


def test_plan_native_matches_python(tmp_path, monkeypatch):
    """The C++ slab enumerator and the NumPy fallback must produce
    bit-identical blocks (indices, distances, sampling draws)."""
    sim = simulate(n_ind=8, n_sites=800, seed=9, mono_rate=0.05)
    pars = make_pars(tmp_path, n_sites=800, max_kb_dist=0, max_snp_dist=25,
                     min_maf=0.05, rnd_sample=0.3, seed=4242)
    pos_dist = pos_dist_from_sim(sim)
    rng = np.random.default_rng(2)
    maf = rng.uniform(0, 0.5, sim.n_sites)
    maf[rng.random(sim.n_sites) < 0.03] = np.nan

    nat = [(b.s1, b.s2, b.dist)
           for b in iter_pair_blocks(pars, maf, pos_dist, block_pairs=500)]
    monkeypatch.setenv("NGSLD_NO_NATIVE", "1")
    py = [(b.s1, b.s2, b.dist)
          for b in iter_pair_blocks(pars, maf, pos_dist, block_pairs=500)]
    assert len(nat) == len(py) and len(nat) > 1
    for (a1, b1, d1), (a2, b2, d2) in zip(nat, py):
        assert np.array_equal(a1, a2)
        assert np.array_equal(b1, b2)
        assert np.array_equal(d1, d2)


def test_child_seeds_native_matches_python(monkeypatch):
    from ngsld_tpu.plan.band import child_seeds
    nat = child_seeds(987654321, 500)
    monkeypatch.setenv("NGSLD_NO_NATIVE", "1")
    py = child_seeds(987654321, 500)
    assert np.array_equal(nat, py)
