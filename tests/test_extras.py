"""Tests for the extras (HMM + optimizer) against NumPy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from ngsld_tpu.extras import hmm
from ngsld_tpu.extras.optimize import findmax, findmax_jax


def _naive_forward(q, alpha, em, dist):
    L, K = em.shape
    stay = np.exp(-alpha * dist)
    f = np.log(q) + em[0]
    for s in range(1, L):
        T = (1 - stay[s]) * q[None, :] + stay[s] * np.eye(K)
        f = np.log(np.exp(f) @ T) + em[s]
    return np.log(np.exp(f).sum())


@pytest.fixture
def case():
    rng = np.random.default_rng(0)
    L, K = 40, 2
    q = np.array([0.7, 0.3])
    alpha = 1e-3
    em = np.log(rng.random((L, K)))
    dist = rng.integers(1, 2000, L).astype(float)
    return q, alpha, em, dist


def test_forward_matches_naive(case):
    q, alpha, em, dist = case
    ll, table = hmm.forward(jnp.asarray(q), alpha, jnp.asarray(em),
                            jnp.asarray(dist))
    assert float(ll) == pytest.approx(_naive_forward(q, alpha, em, dist), rel=1e-5)


def test_forward_backward_agree(case):
    q, alpha, em, dist = case
    llf, _ = hmm.forward(jnp.asarray(q), alpha, jnp.asarray(em), jnp.asarray(dist))
    llb, _ = hmm.backward(jnp.asarray(q), alpha, jnp.asarray(em), jnp.asarray(dist))
    assert float(llf) == pytest.approx(float(llb), rel=1e-5)


def test_posterior_normalized(case):
    q, alpha, em, dist = case
    post = hmm.posterior(jnp.asarray(q), alpha, jnp.asarray(em), jnp.asarray(dist))
    np.testing.assert_allclose(np.asarray(post).sum(axis=1), 1.0, atol=1e-4)


def test_viterbi_path_is_argmax_on_easy_case():
    # strong emissions force the path; transitions nearly free
    em = np.full((10, 2), -50.0)
    truth = np.array([0, 0, 0, 1, 1, 1, 0, 0, 1, 1])
    em[np.arange(10), truth] = 0.0
    q = np.array([0.5, 0.5])
    dist = np.full(10, 1000.0)
    score, path = hmm.viterbi(jnp.asarray(q), 1e-3, jnp.asarray(em),
                              jnp.asarray(dist))
    np.testing.assert_array_equal(np.asarray(path), truth)


def test_joint_geno_prob_table_sums_to_one():
    h = jnp.asarray([0.4, 0.2, 0.3, 0.1])
    t = np.exp(np.asarray(hmm.joint_geno_logprob(h, F=0)))
    assert t.sum() == pytest.approx(1.0, abs=1e-6)
    t1 = np.exp(np.asarray(hmm.joint_geno_logprob(h, F=1)))
    assert t1.sum() == pytest.approx(1.0, abs=1e-6)


def test_emission_ld_is_normalized_over_current_genotype():
    """Summed over hard-called current genotypes, the LD emission is a
    proper conditional P(curr | prev) — provided the conditioning MAF is
    the haplotype-frequency marginal of the previous site (h2 + h3)."""
    h = jnp.asarray([0.5, 0.1, 0.1, 0.3])
    maf_prev = float(h[2] + h[3])
    gl_prev = jnp.log(jnp.asarray([0.7, 0.2, 0.1]))
    tot = 0.0
    for g in range(3):
        gl_curr = jnp.full(3, -50.0).at[g].set(0.0)
        tot += float(jnp.exp(hmm.emission_ld(h, gl_prev, gl_curr, maf_prev, F=0)))
    assert tot == pytest.approx(1.0, abs=1e-3)


def test_findmax_quadratic():
    x, f, ok = findmax(lambda x: -((x[0] - 2) ** 2 + (x[1] + 1) ** 2), [0, 0],
                       lower=[-5, -5], upper=[5, 5])
    assert ok and f == pytest.approx(0, abs=1e-8)
    np.testing.assert_allclose(x, [2, -1], atol=1e-4)


def test_findmax_respects_bounds():
    x, f, ok = findmax(lambda x: x[0], [0.0], lower=[-1], upper=[1])
    assert x[0] == pytest.approx(1.0, abs=1e-8)


def test_findmax_jax_quadratic():
    x, f, ok = findmax_jax(lambda x: -jnp.sum((x - 0.3) ** 2),
                           jnp.asarray([0.1, 0.9]),
                           lower=jnp.zeros(2), upper=jnp.ones(2))
    np.testing.assert_allclose(np.asarray(x), 0.3, atol=1e-3)
