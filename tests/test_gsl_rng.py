"""Unit tests for the taus RNG (scalar and vectorized parity)."""

import numpy as np

from ngsld_tpu.gsl_rng import TausRNG, taus_uniforms


def test_scalar_vs_vectorized_parity():
    seeds = np.array([1, 2, 12345, 999999937, 2**32 - 1, 2**40 + 7], dtype=np.uint64)
    vec = taus_uniforms(seeds, 32)
    for row, seed in enumerate(seeds):
        r = TausRNG(int(seed))
        for j in range(32):
            assert vec[row, j] == r.uniform()


def test_zero_seed_maps_to_one():
    assert [TausRNG(0).get() for _ in range(1)] == [TausRNG(1).get() for _ in range(1)]


def test_determinism_and_range():
    r = TausRNG(12345)
    xs = [r.uniform() for _ in range(1000)]
    assert all(0.0 <= x < 1.0 for x in xs)
    r2 = TausRNG(12345)
    assert xs[:10] == [r2.uniform() for _ in range(10)]


def test_master_child_discipline_matches_reference_shim(ref_binary, tmp_path):
    """The seeded-run conformance test covers this end-to-end; here we only
    check the draw formula draw_rnd(rng,0,INF) -> uint64 truncation is stable."""
    m = TausRNG(12345)
    seeds = [int(m.uniform() * 1e15) for _ in range(5)]
    assert len(set(seeds)) == 5  # distinct child streams
