"""Pallas EM kernel (interpret mode on CPU) vs the XLA reference path."""

import numpy as np
import pytest

from ngsld_tpu.utils.simulate import simulate


def _case(n_pairs, n_ind, seed, miss=True):
    sim = simulate(n_ind=n_ind, n_sites=2 * n_pairs, seed=seed,
                   all_missing_site_rate=0.02 if miss else 0.0)
    gl = sim.gl / sim.gl.sum(axis=2, keepdims=True)
    gn1 = gl[:n_pairs].astype(np.float32)
    gn2 = gl[n_pairs:2 * n_pairs].astype(np.float32)
    eg = gl[..., 1] + 2 * gl[..., 2]
    maf = (eg.mean(axis=1) / 2).astype(np.float32)
    return gn1, gn2, maf[:n_pairs], maf[n_pairs:2 * n_pairs]


@pytest.mark.parametrize("ignore_miss", [False, True])
@pytest.mark.parametrize("n_pairs,n_ind", [(40, 12), (130, 24)])
def test_kernel_matches_xla_path(n_pairs, n_ind, ignore_miss):
    import jax.numpy as jnp
    from ngsld_tpu.kernels.pallas_em import pair_em_pallas
    from ngsld_tpu.ops.em import pair_em

    gn1, gn2, m1, m2 = _case(n_pairs, n_ind, seed=n_pairs + n_ind)
    f_ref, it_ref, nu_ref = pair_em(jnp.asarray(gn1), jnp.asarray(gn2),
                                    jnp.asarray(m1), jnp.asarray(m2),
                                    ignore_miss)
    f_k, it_k, nu_k = pair_em_pallas(jnp.asarray(gn1), jnp.asarray(gn2),
                                     jnp.asarray(m1), jnp.asarray(m2),
                                     ignore_miss, pair_tile=128,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(nu_ref), np.asarray(nu_k))
    fr, fk = np.asarray(f_ref), np.asarray(f_k)
    both_nan = np.isnan(fr) & np.isnan(fk)
    np.testing.assert_allclose(np.where(both_nan, 0, fr),
                               np.where(both_nan, 0, fk), atol=3e-5)
    # iteration counts match except convergence knife-edges
    it_diff = np.abs(np.asarray(it_ref) - np.asarray(it_k))
    assert (it_diff <= 1).mean() > 0.95


@pytest.mark.parametrize("ignore_miss", [False, True])
def test_phased_matches_single_pass(ignore_miss):
    """Two-phase compaction must be exactly equivalent to the plain kernel
    (same f, same nIter) — the phase boundary is semantically invisible."""
    import jax.numpy as jnp
    from ngsld_tpu.kernels.pallas_em import pair_em_pallas, pair_em_phased

    gn1, gn2, m1, m2 = _case(200, 16, seed=77)
    a = [jnp.asarray(x) for x in (gn1, gn2, m1, m2)]
    f1, it1, nu1 = pair_em_pallas(*a, ignore_miss, pair_tile=128,
                                  interpret=True)
    f2, it2, nu2 = pair_em_phased(*a, ignore_miss, cap1=8, pair_tile=128,
                                  interpret=True, bucket=128)
    np.testing.assert_array_equal(np.asarray(it1), it2)
    np.testing.assert_array_equal(np.asarray(nu1), nu2)
    a1, a2 = np.asarray(f1), f2
    nan = np.isnan(a1) & np.isnan(a2)
    np.testing.assert_array_equal(np.where(nan, 0, a1), np.where(nan, 0, a2))


@pytest.mark.parametrize("ignore_miss", [False, True])
def test_sorted_matches_single_pass(ignore_miss):
    """In-jit sorted two-phase must equal the plain kernel exactly."""
    import jax.numpy as jnp
    from ngsld_tpu.kernels.pallas_em import pair_em_pallas, pair_em_sorted

    gn1, gn2, m1, m2 = _case(200, 16, seed=13)
    a = [jnp.asarray(x) for x in (gn1, gn2, m1, m2)]
    f1, it1, nu1 = pair_em_pallas(*a, ignore_miss, pair_tile=128,
                                  interpret=True)
    f2, it2, nu2 = pair_em_sorted(*a, ignore_miss, pair_tile=128,
                                  interpret=True, cap1=8)
    np.testing.assert_array_equal(np.asarray(it1), np.asarray(it2))
    np.testing.assert_array_equal(np.asarray(nu1), np.asarray(nu2))
    a1, a2 = np.asarray(f1), np.asarray(f2)
    nan = np.isnan(a1) & np.isnan(a2)
    np.testing.assert_array_equal(np.where(nan, 0, a1), np.where(nan, 0, a2))


@pytest.mark.parametrize("ignore_miss", [False, True])
@pytest.mark.parametrize("n_pairs,n_ind", [(40, 12), (16, 300)])
def test_rows_kernel_matches_xla_path(n_pairs, n_ind, ignore_miss):
    """The row-layout kernel (the large-cohort path: pairs on sublanes,
    individuals on lanes) must agree with the XLA reference path."""
    import jax.numpy as jnp
    from ngsld_tpu.kernels.pallas_em import pair_em_rows_from_gl
    from ngsld_tpu.ops.em import pair_em

    gn1, gn2, m1, m2 = _case(n_pairs, n_ind, seed=7 * n_pairs + n_ind)
    f_ref, it_ref, nu_ref = pair_em(jnp.asarray(gn1), jnp.asarray(gn2),
                                    jnp.asarray(m1), jnp.asarray(m2),
                                    ignore_miss)
    f_k, it_k, nu_k = pair_em_rows_from_gl(
        jnp.asarray(gn1), jnp.asarray(gn2), jnp.asarray(m1),
        jnp.asarray(m2), ignore_miss, pair_tile=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(nu_ref), np.asarray(nu_k))
    fr, fk = np.asarray(f_ref), np.asarray(f_k)
    both_nan = np.isnan(fr) & np.isnan(fk)
    np.testing.assert_allclose(np.where(both_nan, 0, fr),
                               np.where(both_nan, 0, fk), atol=3e-5)
    it_diff = np.abs(np.asarray(it_ref) - np.asarray(it_k))
    assert (it_diff <= 1).mean() > 0.95


def test_pick_rows_tile_covers_large_cohorts():
    from ngsld_tpu.kernels.pallas_em import pick_pair_tile, pick_rows_tile
    assert pick_pair_tile(2000) is None      # column kernel gives up
    assert pick_rows_tile(2000) is not None  # rows kernel still fits
    assert pick_rows_tile(8000) is not None


@pytest.mark.parametrize("ignore_miss", [False, True])
@pytest.mark.parametrize("n_pairs,n_ind,ic", [(24, 40, 16), (60, 100, 32)])
def test_ichunk_kernel_matches_xla_path(n_pairs, n_ind, ic, ignore_miss):
    """The streamed (I-chunked) kernel must agree with the XLA path for
    cohorts that span several chunks — this is the unbounded-n_ind path
    (reference parity: pair_freq_iter has no cohort ceiling,
    gen_func.cpp:1076-1119)."""
    import jax.numpy as jnp
    from ngsld_tpu.kernels.pallas_em import pair_em_ichunk
    from ngsld_tpu.ops.em import pair_em

    gn1, gn2, m1, m2 = _case(n_pairs, n_ind, seed=7 * n_pairs + n_ind)
    f_ref, it_ref, nu_ref = pair_em(jnp.asarray(gn1), jnp.asarray(gn2),
                                    jnp.asarray(m1), jnp.asarray(m2),
                                    ignore_miss)
    f_k, it_k, nu_k = pair_em_ichunk(jnp.asarray(gn1), jnp.asarray(gn2),
                                     jnp.asarray(m1), jnp.asarray(m2),
                                     ignore_miss, pair_tile=8, i_chunk=ic,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(nu_ref), np.asarray(nu_k))
    fr, fk = np.asarray(f_ref), np.asarray(f_k)
    both_nan = np.isnan(fr) & np.isnan(fk)
    np.testing.assert_allclose(np.where(both_nan, 0, fr),
                               np.where(both_nan, 0, fk), atol=3e-5)
    it_diff = np.abs(np.asarray(it_ref) - np.asarray(it_k))
    assert (it_diff <= 1).mean() > 0.95


def test_ichunk_matches_column_kernel_exactly():
    """Same f32 op order as the other kernels: the streamed kernel's
    accumulation differs only by chunk-partial ordering, which must stay
    within one ulp-scale tolerance of the row kernel."""
    import jax.numpy as jnp
    from ngsld_tpu.kernels.pallas_em import (pair_em_ichunk,
                                             pair_em_pallas)

    gn1, gn2, m1, m2 = _case(32, 48, seed=99)
    a = (jnp.asarray(gn1), jnp.asarray(gn2), jnp.asarray(m1),
         jnp.asarray(m2))
    f1, it1, nu1 = pair_em_pallas(*a, False, pair_tile=128, interpret=True)
    f2, it2, nu2 = pair_em_ichunk(*a, False, pair_tile=8, i_chunk=16,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=2e-5)
    assert (np.abs(np.asarray(it1) - np.asarray(it2)) <= 1).all()


def test_pair_em_live_mask_freezes_dead_lanes():
    """pair_em(live=...): masked-out lanes return the f0 init with
    n_iter == ITER_MAX; live lanes are BIT-identical to the unmasked
    run (per-lane trajectories are independent — the ring steppers rely
    on this to freeze dead rectangle lanes at iteration 0)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ngsld_tpu.constants import ITER_MAX
    from ngsld_tpu.ops.em import pair_em

    rng = np.random.default_rng(7)
    P, I = 64, 10
    gl = rng.dirichlet([2.0, 1.0, 1.0], size=(2 * P, I)).astype(np.float32)
    eg = gl[..., 1] + 2 * gl[..., 2]
    maf = (eg.mean(axis=1) / 2).astype(np.float32)
    a = (jnp.asarray(gl[:P]), jnp.asarray(gl[P:]),
         jnp.asarray(maf[:P]), jnp.asarray(maf[P:]))
    live = jnp.asarray(rng.random(P) < 0.5)
    f_all, it_all, nu_all = jax.jit(pair_em, static_argnums=4)(*a, False)
    f_m, it_m, nu_m = jax.jit(
        lambda g1, g2, m1, m2, lv: pair_em(g1, g2, m1, m2, False, live=lv)
    )(*a, live)
    lv = np.asarray(live)
    np.testing.assert_array_equal(np.asarray(f_m)[lv],
                                  np.asarray(f_all)[lv])
    np.testing.assert_array_equal(np.asarray(it_m)[lv],
                                  np.asarray(it_all)[lv])
    # dead lanes: the f0 init (independence prior) and the ITER_MAX marker
    m1, m2 = np.asarray(a[2])[~lv], np.asarray(a[3])[~lv]
    f0 = np.stack([(1 - m1) * (1 - m2), (1 - m1) * m2,
                   m1 * (1 - m2), m1 * m2], axis=1)
    np.testing.assert_array_equal(np.asarray(f_m)[~lv], f0)
    assert (np.asarray(it_m)[~lv] == ITER_MAX).all()
    np.testing.assert_array_equal(np.asarray(nu_m), np.asarray(nu_all))
