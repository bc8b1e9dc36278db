"""Unit tests of strict-engine primitives against simple properties/oracles."""

import math

import numpy as np
import pytest

from ngsld_tpu import strict
from ngsld_tpu.constants import EPSILON


def test_logsum3_matches_naive():
    for a in ([0.0, -1.0, -2.0], [-700.0, -701.0, -702.0], [-1e15, -1e15, 0.0]):
        ref = math.log(sum(math.exp(v - max(a)) for v in a)) + max(a)
        assert strict.logsum3(*a) == pytest.approx(ref, rel=1e-15)


def test_post_prob3_normalizes():
    pp = strict.post_prob3([math.log(0.2), math.log(0.3), math.log(0.5)])
    assert sum(math.exp(v) for v in pp) == pytest.approx(1.0, abs=1e-12)


def test_miss_data_rows():
    g = np.array([[0.333333, 0.333334, 0.333333],
                  [0.9, 0.05, 0.05],
                  [0.5, 0.5, 0.5 + 2e-5]])
    m = strict.miss_data_rows(g)
    assert m.tolist() == [True, False, False]


def test_pair_em_sums_to_one_and_recovers_ld():
    """EM fixed-point properties: frequencies sum to 1; perfectly correlated
    certain genotypes give |D'| = 1."""
    n_ind = 40
    rng = np.random.default_rng(0)
    hap = rng.random(n_ind * 2) < 0.4  # shared haplotype allele at both sites
    g = hap.reshape(n_ind, 2).sum(axis=1)  # genotype 0/1/2 identical at s1,s2
    gl = np.zeros((n_ind, 3))
    gl[np.arange(n_ind), g] = 1.0
    gn = gl[None].repeat(2, axis=0)  # (2, n_ind, 3)
    maf = np.array([g.mean() / 2.0])
    f, n_iter, n_used = strict.pair_em_batch(gn[0][None], gn[1][None], maf, maf, False)
    assert f.sum() == pytest.approx(1.0, abs=1e-9)
    assert n_used[0] == n_ind
    _, _, D, Dp, r2 = strict.ld_stats_batch(f)
    assert abs(Dp[0]) == pytest.approx(1.0, abs=1e-3)
    assert r2[0] == pytest.approx(1.0, abs=1e-3)


def test_pearson_r2_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.random((5, 30))
    y = 0.5 * x + rng.random((5, 30))
    mine = strict.pearson_r2_batch(x, y)
    for p in range(5):
        ref = np.corrcoef(x[p], y[p])[0, 1] ** 2
        assert mine[p] == pytest.approx(ref, rel=1e-10)


def test_est_maf_closed_form():
    """With a NULL prior the MAF EM equals mean(E[G])/2 over individuals."""
    rng = np.random.default_rng(2)
    gl = rng.dirichlet([1, 1, 1], size=(6, 20))  # (sites, ind, 3) normalized
    gl_log = np.log(gl)
    maf = strict.est_maf_all(gl_log, False)
    expect = (gl[..., 1] + 2 * gl[..., 2]).mean(axis=1) / 2.0
    np.testing.assert_allclose(maf, expect, rtol=1e-9)


def test_formatting_matches_c_printf():
    assert strict.fmt_f(0.0) == "0.000000"
    assert strict.fmt_f(-1e-9) == "-0.000000"
    assert strict.fmt_f(float("inf")) == "inf"
    assert strict.fmt_f(np.float64("nan")) == "nan"
    assert strict.fmt_f(-np.float64("nan")) == "-nan"
    assert strict.fmt_f0(1234.6) == "1235"
    assert strict.fmt_f0(float("inf")) == "inf"


def test_read_pos_contig_breaks(tmp_path):
    p = tmp_path / "t.pos"
    p.write_text("chr1\t100\nchr1\t250\nchr2\t80\nchr2\t90\n")
    dist, labels = strict.read_pos(str(p), False, 4)
    assert dist[0] == 100.0  # first site: pos - 0
    assert dist[1] == 150.0
    assert math.isinf(dist[2])  # contig change
    assert dist[3] == 10.0
    assert labels == ["chr1:100", "chr1:250", "chr2:80", "chr2:90"]


def test_read_pos_nondecreasing_errors(tmp_path):
    p = tmp_path / "t.pos"
    p.write_text("chr1\t100\nchr1\t100\n")
    with pytest.raises(strict.StrictError):
        strict.read_pos(str(p), False, 2)


def test_read_pos_extra_lines_error(tmp_path):
    """The reference reads ALL pos lines and errors on a count mismatch
    (read_data.cpp:178-179); truncation would emit output the reference
    refuses. Both the native and pure-Python readers must error."""
    import os

    p = tmp_path / "extra.pos"
    p.write_text("chr1\t100\nchr1\t200\nchr1\t300\n")
    for no_native in ("0", "1"):
        os.environ["NGSLD_NO_NATIVE"] = no_native
        try:
            with pytest.raises(strict.StrictError, match="wrong number"):
                strict.read_pos(str(p), False, 2)
        finally:
            del os.environ["NGSLD_NO_NATIVE"]


def test_read_pos_negative_position_errors(tmp_path):
    """C strtoul wraps '-N' modulo 2^64, so a negative position makes the
    next same-chr distance hugely negative -> 'invalid distance' error."""
    p = tmp_path / "neg.pos"
    p.write_text("chr1\t-10\nchr1\t-5\n")
    with pytest.raises(strict.StrictError, match="invalid distance"):
        strict.read_pos(str(p), False, 2)


def test_strtod_full_rejects_c_incompatible_tokens():
    """Python float() is looser than C strtod's consume-whole-token rule:
    trailing whitespace (CRLF files) and '_' separators must be rejected."""
    assert strict._strtod_full("0.33\r") is None
    assert strict._strtod_full("1_0") is None
    # C strtod SKIPS leading whitespace (verified against glibc)
    assert strict._strtod_full(" 0.33") == 0.33
    assert strict._strtod_full("\r0.33") == 0.33
    assert strict._strtod_full("0x.8p1") == 1.0
    import math as _m
    assert _m.isnan(strict._strtod_full("nan(123)"))
    assert strict._strtod_full("0.33") == 0.33
    assert strict._strtod_full("-1e-3") == -1e-3
    assert strict._strtod_full("inf") == float("inf")
    import math
    assert math.isnan(strict._strtod_full("nan"))
    assert strict._strtod_full("0x1p3") == 8.0


def test_strtoul_overflow_clamps():
    """C strtoul clamps magnitude overflow to ULONG_MAX (either sign)."""
    assert strict._strtoul_prefix("99999999999999999999999999") == 2**64 - 1
    assert strict._strtoul_prefix("-99999999999999999999999999") == 2**64 - 1
    assert strict._strtoul_prefix("-5") == 2**64 - 5
