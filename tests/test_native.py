"""Native C++ host runtime vs pure-Python paths: bit-identical."""

import os

import numpy as np
import pytest

from ngsld_tpu import strict
from ngsld_tpu.native import (format_rows_native, get_lib, make_labels_blob,
                              read_geno_native)
from ngsld_tpu.utils.simulate import simulate, write_all


@pytest.fixture(scope="module")
def fixdir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nat"))
    sim = simulate(n_ind=9, n_sites=200, seed=31, all_missing_site_rate=0.02)
    return write_all(sim, d)


def _python_read(path, in_bin, in_probs, in_logscale, n_ind, n_sites):
    os.environ["NGSLD_NO_NATIVE"] = "1"
    try:
        return strict.read_geno(path, in_bin, in_probs, in_logscale,
                                n_ind, n_sites)
    finally:
        del os.environ["NGSLD_NO_NATIVE"]


@pytest.mark.parametrize("fmt,kw", [
    ("beagle", dict(in_bin=False, in_probs=True, in_logscale=False)),
    ("geno_text", dict(in_bin=False, in_probs=False, in_logscale=False)),
    ("glf", dict(in_bin=True, in_probs=True, in_logscale=True)),
])
def test_native_reader_bit_identical(fixdir, fmt, kw):
    if get_lib() is None:
        pytest.skip("no native toolchain")
    a = read_geno_native(fixdir[fmt], n_ind=9, n_sites=200, **kw)
    b = _python_read(fixdir[fmt], n_ind=9, n_sites=200, **kw)
    # bit-exact, NaN-aware
    np.testing.assert_array_equal(a.view(np.int64), b.view(np.int64))


def test_native_reader_error_messages(tmp_path):
    if get_lib() is None:
        pytest.skip("no native toolchain")
    p = tmp_path / "short.glf"
    p.write_bytes(b"\0" * 8 * 3 * 2)  # too short for 2 sites x 2 ind
    with pytest.raises(strict.StrictError, match="premature EOF"):
        read_geno_native(str(p), True, True, True, 2, 2)


def test_native_formatter_matches_python():
    if get_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    n = 64
    labels = [f"chr{i%3}:{100+i}" for i in range(n + 1)]
    blob, off = make_labels_blob(labels)
    s1 = np.arange(n, dtype=np.int64)
    s2 = s1 + 1
    dist = rng.uniform(1, 1e5, n)
    dist[0] = np.inf
    vals = [rng.uniform(-1, 1, n) for _ in range(4)]
    vals[1][1] = np.nan
    vals[2][2] = np.float64(np.inf)
    vals[3][3] = -np.float64("nan")
    hap = rng.dirichlet([1, 1, 1, 1], n)
    chi2 = rng.uniform(0, 5, n).astype(np.float32)
    n_used = rng.integers(1, 10, n).astype(np.int32)
    n_iter = rng.integers(0, 100, n).astype(np.int32)
    maf1, maf2 = rng.uniform(0, 0.5, n), rng.uniform(0, 0.5, n)
    hm1, hm2 = rng.uniform(0, 0.5, n), rng.uniform(0, 0.5, n)

    native = format_rows_native(blob, off, s1, s2, dist, vals[0], vals[1],
                                vals[2], vals[3], True, n_used, maf1, maf2,
                                hap, hm1, hm2, chi2, n_iter).decode()

    py_rows = []
    for j in range(n):
        row = (f"{labels[s1[j]]}\t{labels[s2[j]]}\t{strict.fmt_f0(dist[j])}"
               f"\t{strict.fmt_f(vals[0][j])}\t{strict.fmt_f(vals[1][j])}"
               f"\t{strict.fmt_f(vals[2][j])}\t{strict.fmt_f(vals[3][j])}")
        row += ("\t%d\t%s\t%s\t%s\t%s\t%s\t%s\t%s\t%s\t%s\t%s\t%d"
                % (n_used[j], strict.fmt_f(maf1[j]), strict.fmt_f(maf2[j]),
                   strict.fmt_f(hap[j, 0]), strict.fmt_f(hap[j, 1]),
                   strict.fmt_f(hap[j, 2]), strict.fmt_f(hap[j, 3]),
                   strict.fmt_f(hm1[j]), strict.fmt_f(hm2[j]),
                   strict.fmt_f(np.float64(chi2[j])), strict.fmt_f(0.0),
                   n_iter[j]))
        py_rows.append(row + "\n")
    assert native == "".join(py_rows)


def test_fmt_f6_fuzz_matches_glibc():
    """The custom %f path must be byte-identical to correctly-rounded dtoa
    (CPython's '%f' == glibc's). Fuzz across magnitudes plus crafted exact
    decimal ties (dyadic rationals k/2^m landing exactly on x.xxxxxx5)."""
    import ctypes

    from ngsld_tpu.native import get_lib
    lib = get_lib()
    if lib is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(99)
    vals = [
        rng.uniform(-2, 2, 20000),                      # stats range
        rng.uniform(0, 1, 20000),                       # freqs
        rng.standard_normal(20000) * 10.0 ** rng.integers(-9, 12, 20000),
        np.array([0.0, -0.0, np.nan, -np.nan, np.inf, -np.inf, 1e9 - 0.5,
                  1e9, -1e9, 0.0078125, -0.0078125,     # exact tie 2^-7
                  0.5e-6, 1.5e-6, 2.5e-6, 0.9999995,
                  123456.1234565, 5 / 2**26, 3 / 2**27]),
        np.ldexp(rng.integers(1, 2**52, 5000).astype(np.float64),
                 rng.integers(-80, -20, 5000)),         # random dyadics
        # near-integer products: 6-decimal values put v*1e6 within an ulp
        # of an integer — the band the fast path newly covers (converged
        # EM corners print exact 0.000000/1.000000 constantly)
        np.round(rng.uniform(0, 512, 20000), 6),
        np.nextafter(np.round(rng.uniform(0, 512, 5000), 6), np.inf),
        np.nextafter(np.round(rng.uniform(0, 512, 5000), 6), -np.inf),
    ]
    for arr in vals:
        arr = np.ascontiguousarray(arr, np.float64)
        n = len(arr)
        for zero_dec in (0, 1):
            buf = ctypes.create_string_buffer(64 * n)
            lib.ngsld_fmt_batch(
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                n, zero_dec, buf)
            for i in range(n):
                got = buf.raw[64 * i:64 * (i + 1)].split(b"\0", 1)[0].decode()
                want = (strict.fmt_f0 if zero_dec else strict.fmt_f)(arr[i])
                assert got == want, f"v={arr[i]!r}: {got} != {want}"


def test_formatter_f32_entry_matches_f64():
    """The float32 formatter entry point must produce identical bytes to
    converting host-side first (float->double is exact)."""
    from ngsld_tpu.native import format_rows_native, get_lib, make_labels_blob
    if get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(5)
    n = 4000
    labels = [f"chr{i}:{i * 13 + 1}" for i in range(500)]
    blob, off = make_labels_blob(labels)
    s1 = rng.integers(0, 499, n)
    s2 = rng.integers(0, 499, n)
    dist = rng.integers(1, 10**7, n).astype(np.float64)
    v32 = [rng.uniform(-1, 1, n).astype(np.float32) for _ in range(4)]
    hap = rng.uniform(0, 1, (n, 4)).astype(np.float32)
    hm1 = rng.uniform(0, 0.5, n).astype(np.float32)
    hm2 = rng.uniform(0, 0.5, n).astype(np.float32)
    chi2 = rng.uniform(0, 50, n).astype(np.float32)
    ni = rng.integers(1, 100, n).astype(np.int32)
    nu = np.full(n, 100, np.int32)
    maf1 = rng.uniform(0, 0.5, n)
    maf2 = rng.uniform(0, 0.5, n)
    a = format_rows_native(blob, off, s1, s2, dist, *v32, True, nu,
                           maf1, maf2, hap, hm1, hm2, chi2, ni)
    b = format_rows_native(blob, off, s1, s2, dist,
                           *[np.float64(v) for v in v32], True, nu,
                           maf1, maf2, np.float64(hap), np.float64(hm1),
                           np.float64(hm2), chi2, ni)
    assert a == b


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_derive_formatter_matches_host_path(dtype):
    """The derive-and-format entry (stats computed in C worker threads)
    must be byte-identical to deriving via engine._stats_host/_chi2_host
    then formatting — including degenerate freqs (inf/nan Dp, r2, chi2)."""
    from ngsld_tpu.engine import _chi2_host, _stats_host
    from ngsld_tpu.native import (format_rows_derive, format_rows_native,
                                  get_lib, make_labels_blob)
    if get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(11)
    n = 5000
    labels = [f"chr{i}:{i * 7 + 3}" for i in range(800)]
    blob, off = make_labels_blob(labels)
    s1 = rng.integers(0, 799, n)
    s2 = rng.integers(0, 799, n)
    dist = rng.integers(1, 10**6, n).astype(np.float64)
    # hap freqs: random simplex + crafted degenerate corners
    f = rng.dirichlet([1.0, 0.8, 0.8, 0.5], n).astype(dtype)
    f[0] = [1, 0, 0, 0]
    f[1] = [0.5, 0.5, 0, 0]
    f[2] = [0.5, 0, 0.5, 0]
    f[3] = [0, 0, 0, 1]
    r2p = rng.uniform(0, 1, n).astype(dtype)
    maf1 = rng.uniform(0, 0.5, n)
    maf2 = rng.uniform(0, 0.5, n)
    nu = np.full(n, 33, np.int32)
    ni = rng.integers(1, 100, n).astype(np.int32)

    for extend in (True, False):
        got = format_rows_derive(blob, off, s1, s2, dist, r2p, f,
                                 maf1, maf2, nu, ni, extend)
        hmaf0, hmaf1, D, Dp, r2 = _stats_host(f)
        chi2 = _chi2_host(f)
        want = format_rows_native(blob, off, s1, s2, dist, r2p, D, Dp, r2,
                                  extend, nu, maf1, maf2, f, hmaf0, hmaf1,
                                  chi2, ni)
        assert got == want, f"extend={extend} dtype={dtype}"


def test_native_strict_refine_bit_identical():
    """ngsld_strict_siteprep / ngsld_strict_pair_em vs the Python strict
    pipeline: bit-for-bit (the refiner's exact-zero tier depends on it)."""
    from ngsld_tpu import strict
    from ngsld_tpu.native import (get_lib, strict_pair_em_native,
                                  strict_siteprep_native)
    from ngsld_tpu.utils.simulate import simulate
    if get_lib() is None:
        import pytest
        pytest.skip("native unavailable")

    sim = simulate(n_ind=9, n_sites=300, seed=7,
                   all_missing_site_rate=0.05, mono_rate=0.1)
    lograw = np.log(sim.gl.astype(np.float64))
    for call_geno, ignore in ((False, False), (True, True)):
        rows = lograw.copy()
        g_py = np.empty_like(rows)
        for s in range(rows.shape[0]):
            for i in range(rows.shape[1]):
                g_py[s, i] = strict.post_prob3(list(rows[s, i]))
        if call_geno:
            strict.call_geno_inplace(g_py, 0.3, 0.9)
        maf_py = strict.est_maf_all(g_py, ignore)
        gn_py = strict.libm_exp(g_py)
        gn_c, maf_c, eg_c = strict_siteprep_native(
            lograw.copy(), True, False, call_geno, 0.3, 0.9, ignore)
        np.testing.assert_array_equal(gn_c, gn_py)
        np.testing.assert_array_equal(
            np.nan_to_num(maf_c, nan=-1), np.nan_to_num(maf_py, nan=-1))
        np.testing.assert_array_equal(
            eg_c, gn_py[:, :, 1] + 2 * gn_py[:, :, 2])

        s1, s2 = np.arange(0, 120), np.arange(150, 270)
        f_py, it_py, nu_py = strict.pair_em_batch(
            gn_py[s1], gn_py[s2], maf_py[s1], maf_py[s2], ignore)
        f_c, it_c, nu_c = strict_pair_em_native(
            gn_c[s1], gn_c[s2], maf_c[s1], maf_c[s2], ignore)
        nan = np.isnan(f_py) & np.isnan(f_c)
        np.testing.assert_array_equal(np.where(nan, 0, f_py),
                                      np.where(nan, 0, f_c))
        np.testing.assert_array_equal(it_py, it_c)
        np.testing.assert_array_equal(nu_py, nu_c)


def test_derive_formatter_overrides_match_splice():
    """Override rows (refined degenerate pairs) must emit their f64
    pass-through columns byte-identically to formatting them separately,
    with every other row still f32-derived in place."""
    from ngsld_tpu.engine import _chi2_host, _stats_host
    from ngsld_tpu.native import (format_rows_derive, format_rows_native,
                                  get_lib, make_labels_blob)
    if get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(5)
    n = 4000
    labels = [f"chr{i}:{i * 11 + 1}" for i in range(500)]
    blob, off = make_labels_blob(labels)
    s1 = rng.integers(0, 499, n)
    s2 = rng.integers(0, 499, n)
    dist = rng.integers(1, 10**6, n).astype(np.float64)
    f = rng.dirichlet([1.0, 0.8, 0.8, 0.5], n).astype(np.float32)
    r2p = rng.uniform(0, 1, n).astype(np.float32)
    maf1 = rng.uniform(0, 0.5, n)
    maf2 = rng.uniform(0, 0.5, n)
    nu = rng.integers(1, 100, n).astype(np.int32)
    ni = rng.integers(1, 100, n).astype(np.int32)
    idx = np.unique(rng.integers(0, n, 200))
    k = len(idx)
    oc = dict(r2p=rng.uniform(0, 1, k), D=rng.normal(size=k),
              Dp=rng.normal(size=k), r2=rng.uniform(0, 1, k),
              maf1=rng.uniform(0, 0.5, k), maf2=rng.uniform(0, 0.5, k),
              f=rng.dirichlet([1.0] * 4, k),
              hmaf1=rng.uniform(0, 1, k), hmaf2=rng.uniform(0, 1, k),
              chi2=rng.uniform(0, 50, k).astype(np.float32),
              n_used=rng.integers(1, 100, k).astype(np.int32),
              n_iter=rng.integers(1, 100, k).astype(np.int32))
    oc["Dp"][0] = np.nan
    oc["r2"][1 % k] = np.inf
    for extend in (True, False):
        got = format_rows_derive(blob, off, s1, s2, dist, r2p, f,
                                 maf1, maf2, nu, ni, extend,
                                 overrides=(idx, oc))
        # expected: derive-format all rows, then splice the override rows
        # formatted as f64 pass-through
        plain = format_rows_derive(blob, off, s1, s2, dist, r2p, f,
                                   maf1, maf2, nu, ni, extend)
        sub = format_rows_native(
            blob, off, s1[idx], s2[idx], dist[idx], oc["r2p"], oc["D"],
            oc["Dp"], oc["r2"], extend, oc["n_used"], oc["maf1"],
            oc["maf2"], oc["f"], oc["hmaf1"], oc["hmaf2"], oc["chi2"],
            oc["n_iter"])
        lines = plain.splitlines(keepends=True)
        sub_lines = sub.splitlines(keepends=True)
        for j, r in enumerate(idx):
            lines[r] = sub_lines[j]
        assert got == b"".join(lines), f"extend={extend}"


def test_tier_scan_native_matches_numpy():
    """ngsld_tier_scan vs the numpy classification: identical tiers on
    random, corner, and strided (fm[:, 1:5]-style) inputs."""
    from ngsld_tpu import refine
    from ngsld_tpu.native import get_lib, tier_scan_native
    if get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(3)
    n = 20000
    for dtype in (np.float32, np.float64):
        f = rng.dirichlet([0.4, 0.4, 0.4, 0.4], n).astype(dtype)
        # plant corners and junk
        f[0] = [1, 0, 0, 0]
        f[1] = [0.5, 0.5, 0, 0]
        f[2] = [0.25, 0.25, 0.25, 0.25]
        f[3, 0] = np.nan
        f[4, 2] = np.inf
        for prec in ("f32", "f64"):
            got, nz = tier_scan_native(f, prec == "f32")
            os.environ["NGSLD_NO_NATIVE"] = "1"
            try:
                want = refine.degenerate_tiers(f, prec)
            finally:
                del os.environ["NGSLD_NO_NATIVE"]
            np.testing.assert_array_equal(got, want)
            assert nz == int((want != 0).sum())
        # strided view: freqs in cols 1:5 of a (n, 5) fm matrix
        fm = np.concatenate([rng.uniform(size=(n, 1)).astype(dtype), f],
                            axis=1)
        got2, _ = tier_scan_native(fm[:, 1:5], True)
        os.environ["NGSLD_NO_NATIVE"] = "1"
        try:
            want2 = refine.degenerate_tiers(fm[:, 1:5], "f32")
        finally:
            del os.environ["NGSLD_NO_NATIVE"]
        np.testing.assert_array_equal(got2, want2)


def test_pearson_r2_native_matches_longdouble():
    """ngsld_pearson_r2 vs the numpy longdouble one-pass update:
    bit-identical r^2 (both are 80-bit x87 long double in the same
    op order)."""
    from ngsld_tpu.native import get_lib, pearson_r2_native
    if get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(9)
    for P, n in ((300, 7), (100, 100), (64, 1), (32, 513)):
        x = rng.normal(size=(P, n))
        y = rng.normal(size=(P, n))
        # constant rows -> zero variance -> nan path
        x[0] = 1.0
        y[1] = -2.0
        got = pearson_r2_native(x, y)
        os.environ["NGSLD_NO_NATIVE"] = "1"
        try:
            want = strict.pearson_r2_batch(x, y)
        finally:
            del os.environ["NGSLD_NO_NATIVE"]
        nan = np.isnan(want) & np.isnan(got)
        np.testing.assert_array_equal(np.where(nan, 0, got),
                                      np.where(nan, 0, want))


def test_lane_parallel_strict_em_byte_equal_scalar():
    """The lane-parallel (8-wide) strict pair EM must be BYTE-identical
    to the one-pair-at-a-time scalar oracle kept in the library
    (ngsld_strict_pair_em_scalar): per-lane IEEE ops in the exact scalar
    fold order, fma contraction disabled at build time (r5)."""
    import ctypes

    import numpy as np
    import pytest

    from ngsld_tpu.native import _dp, get_lib, strict_pair_em_native
    lib = get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    fn = lib.ngsld_strict_pair_em_scalar
    fn.restype = None
    fn.argtypes = lib.ngsld_strict_pair_em.argtypes

    rng = np.random.default_rng(33)
    for k, I, im in [(257, 100, False), (64, 9, True), (5, 3, False)]:
        gl = rng.dirichlet([2.0, 1.0, 1.0], size=(2 * k, I))
        gl[rng.random((2 * k, I)) < 0.2] = 1 / 3   # missing rows
        gn1 = np.ascontiguousarray(gl[:k])
        gn2 = np.ascontiguousarray(gl[k:])
        maf1 = rng.uniform(0, 0.5, k)
        maf2 = rng.uniform(0, 0.5, k)
        maf1[: k // 3] = rng.uniform(0, 1e-4, k // 3)  # degenerate band
        f_v, it_v, nu_v = strict_pair_em_native(gn1, gn2, maf1, maf2, im)
        f_s = np.empty((k, 4))
        it_s = np.empty(k, np.int32)
        nu_s = np.empty(k, np.int32)
        fn(_dp(gn1), _dp(gn2), _dp(np.ascontiguousarray(maf1)),
           _dp(np.ascontiguousarray(maf2)), int(im), k, I, _dp(f_s),
           it_s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
           nu_s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        assert f_v.tobytes() == f_s.tobytes()
        assert np.array_equal(it_v, it_s)
        assert np.array_equal(nu_v, nu_s)


def test_mt_strict_paths_partition_invariant():
    """ngsld_strict_pair_em_mt / ngsld_strict_siteprep_mt: results are
    byte-identical at ANY thread count (per-pair/per-site work never
    crosses a partition; r5 — multi-core hosts scale the knife-edge
    repair like the MT formatter)."""
    import ctypes

    import numpy as np
    import pytest

    from ngsld_tpu.native import (_dp, get_lib, strict_pair_em_native,
                                  strict_siteprep_native)
    lib = get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(5)
    k, I = 403, 17
    gl = rng.dirichlet([2.0, 1.0, 1.0], size=(2 * k, I))
    gl[rng.random((2 * k, I)) < 0.1] = 1 / 3
    gn1 = np.ascontiguousarray(gl[:k])
    gn2 = np.ascontiguousarray(gl[k:])
    maf1 = rng.uniform(0, 0.5, k)
    maf2 = rng.uniform(0, 0.5, k)
    ref = strict_pair_em_native(gn1, gn2, maf1, maf2, True)
    for nt in (2, 5, 8):
        f = np.empty((k, 4))
        it = np.empty(k, np.int32)
        nu = np.empty(k, np.int32)
        lib.ngsld_strict_pair_em_mt(
            _dp(gn1), _dp(gn2), _dp(np.ascontiguousarray(maf1)),
            _dp(np.ascontiguousarray(maf2)), 1, k, I, _dp(f),
            it.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            nu.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nt)
        assert f.tobytes() == ref[0].tobytes()
        assert np.array_equal(it, ref[1]) and np.array_equal(nu, ref[2])
    raw = np.log(rng.dirichlet([2.0, 1.0, 1.0], size=(397, 13)))
    ref2 = strict_siteprep_native(raw.copy(), True, False, True, 0.3,
                                  0.9, True)
    for nt in (3, 7):
        rows = np.ascontiguousarray(raw.copy())
        gn = np.empty_like(rows)
        maf = np.empty(397)
        eg = np.empty((397, 13))
        rc = lib.ngsld_strict_siteprep_mt(
            _dp(rows), 397, 13, 1, 0, 1, 0.3, 0.9, 1, _dp(gn), _dp(maf),
            _dp(eg), nt)
        assert rc == 0
        assert gn.tobytes() == ref2[0].tobytes()
        assert maf.tobytes() == ref2[1].tobytes()
        assert eg.tobytes() == ref2[2].tobytes()
