"""Likelihood quadrature vs analytic overrides (reference test_likelihoods.py).

Strategy: for likelihoods with analytic variational_expectations /
predict_mean_and_var, the Gauss–Hermite base-class fallback must agree to
~1e-6 in f64. Plus Monte-Carlo cross-checks for the rest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu.likelihoods import (
    Bernoulli,
    Beta,
    Exponential,
    Gamma,
    Gaussian,
    Likelihood,
    MultiClass,
    Ordinal,
    Poisson,
    StudentT,
    SwitchedLikelihood,
    probit,
)

rng = np.random.RandomState(0)
N = 10
Fmu = rng.randn(N, 1)
Fvar = 0.01 + rng.rand(N, 1) ** 2


def quadrature_fallbacks(lik):
    """Call the base-class quadrature methods regardless of overrides."""
    ve = Likelihood.variational_expectations(lik, Fmu, Fvar, lik._testY)
    pm, pv = Likelihood.predict_mean_and_var(lik, Fmu, Fvar)
    pd = Likelihood.predict_density(lik, Fmu, Fvar, lik._testY)
    return ve, pm, pv, pd


@pytest.mark.parametrize(
    "make",
    [
        lambda: (Gaussian(variance=0.37), 0.5 * rng.randn(N, 1)),
        lambda: (Poisson(), rng.poisson(1.0, (N, 1)).astype(float)),
        lambda: (Exponential(), rng.exponential(1.0, (N, 1))),
        lambda: (Gamma(), rng.gamma(2.0, 1.0, (N, 1))),
        lambda: (Bernoulli(), rng.randint(0, 2, (N, 1)).astype(float)),
    ],
    ids=["gaussian", "poisson", "exponential", "gamma", "bernoulli"],
)
def test_analytic_matches_quadrature(make):
    lik, Y = make()
    lik._testY = Y
    ve_q, pm_q, pv_q, pd_q = quadrature_fallbacks(lik)
    ve = lik.variational_expectations(Fmu, Fvar, Y)
    pm, pv = lik.predict_mean_and_var(Fmu, Fvar)
    pd = lik.predict_density(Fmu, Fvar, Y)
    np.testing.assert_allclose(np.asarray(ve), np.asarray(ve_q), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pm_q), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(pv_q), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pd), np.asarray(pd_q), atol=1e-4)


def test_gaussian_var_exp_formula():
    lik = Gaussian(variance=0.25)
    Y = rng.randn(N, 1)
    ve = np.asarray(lik.variational_expectations(Fmu, Fvar, Y))
    expected = (
        -0.5 * np.log(2 * np.pi)
        - 0.5 * np.log(0.25)
        - 0.5 * ((Y - Fmu) ** 2 + Fvar) / 0.25
    )
    np.testing.assert_allclose(ve, expected, atol=1e-10)


def test_bernoulli_probit_clamp_constant():
    # parity: probit(0) = 0.5 exactly under the (1-2e-3)+1e-3 clamp
    assert abs(float(probit(jnp.asarray(0.0))) - 0.5) < 1e-12
    assert float(probit(jnp.asarray(-20.0))) >= 1e-3 - 1e-12
    assert float(probit(jnp.asarray(20.0))) <= 1 - 1e-3 + 1e-12


def test_studentt_conditional_variance():
    lik = StudentT(deg_free=5.0, scale=1.3)
    F = rng.randn(N, 1)
    cv = np.asarray(lik.conditional_variance(F))
    np.testing.assert_allclose(cv, 1.3**2 * 5.0 / 3.0, atol=1e-10)


def test_studentt_var_exp_quadrature_vs_mc():
    lik = StudentT(deg_free=4.0, scale=0.8)
    Y = rng.randn(N, 1)
    ve = np.asarray(lik.variational_expectations(Fmu, Fvar, Y))
    S = 400_000
    f = Fmu[None] + np.sqrt(Fvar)[None] * np.random.RandomState(1).randn(S, N, 1)
    from scipy.stats import t as tdist

    logp = tdist.logpdf(Y[None], 4.0, loc=f, scale=0.8)
    mc = logp.mean(0)
    np.testing.assert_allclose(ve, mc, atol=5e-3)


def test_beta_moments():
    lik = Beta(scale=3.0)
    F = rng.randn(N, 1)
    m = np.asarray(lik.conditional_mean(F))
    v = np.asarray(lik.conditional_variance(F))
    p = np.asarray(probit(jnp.asarray(F)))
    np.testing.assert_allclose(m, p, atol=1e-8)
    np.testing.assert_allclose(v, p * (1 - p) / 4.0, atol=1e-8)


def test_multiclass_prob_is_largest_sums_to_one():
    K = 4
    lik = MultiClass(K)
    mu = rng.randn(7, K)
    var = 0.1 + rng.rand(7, K)
    pm, pv = lik.predict_mean_and_var(jnp.asarray(mu), jnp.asarray(var))
    pm = np.asarray(pm)
    # the reference's (1-2e-4)+1e-4 CDF clamp biases the product slightly
    np.testing.assert_allclose(pm.sum(1), 1.0, atol=5e-4)
    assert (pm > 0).all()


def test_multiclass_var_exp_matches_mc():
    K = 3
    lik = MultiClass(K)
    mu = rng.randn(5, K)
    var = 0.2 + 0.3 * rng.rand(5, K)
    Y = rng.randint(0, K, (5, 1))
    ve = np.asarray(lik.variational_expectations(
        jnp.asarray(mu), jnp.asarray(var), jnp.asarray(Y)))
    S = 200_000
    f = mu[None] + np.sqrt(var)[None] * np.random.RandomState(2).randn(S, 5, K)
    hits = (np.argmax(f, axis=2) == Y[:, 0][None]).mean(0)[:, None]
    eps = 1e-3
    mc = hits * np.log(1 - eps) + (1 - hits) * np.log(eps / (K - 1))
    # MC s.e. ≈ 0.0085 at S=200k (log-ratio scale ~7.6); GH20 itself is
    # converged to <1e-8 vs GH100, so the slack here is purely MC noise
    np.testing.assert_allclose(ve, mc, atol=0.03)


def test_switched_likelihood_partitions():
    lik = SwitchedLikelihood([Gaussian(variance=0.1), Gaussian(variance=2.0)])
    F = rng.randn(8, 1)
    Ydata = rng.randn(8, 1)
    ind = np.array([0, 1, 0, 1, 1, 0, 0, 1], dtype=float)[:, None]
    Y = np.concatenate([Ydata, ind], axis=1)
    lp = np.asarray(lik.logp(jnp.asarray(F), jnp.asarray(Y)))
    g1 = np.asarray(Gaussian(variance=0.1).logp(jnp.asarray(F), jnp.asarray(Ydata)))
    g2 = np.asarray(Gaussian(variance=2.0).logp(jnp.asarray(F), jnp.asarray(Ydata)))
    expected = np.where(ind == 0, g1, g2)
    np.testing.assert_allclose(lp, expected, atol=1e-10)


def test_ordinal_probs_normalize():
    lik = Ordinal(bin_edges=np.array([-1.0, 0.0, 1.0]))
    F = rng.randn(6, 1)
    # sum over bins of exp(logp) must be ~1 (up to the +1e-6 clamp)
    total = np.zeros((6, 1))
    for b in range(4):
        Y = np.full((6, 1), b)
        total += np.exp(np.asarray(lik.logp(jnp.asarray(F), Y)))
    np.testing.assert_allclose(total, 1.0, atol=1e-4)


def test_ordinal_conditional_moments_vs_bruteforce():
    lik = Ordinal(bin_edges=np.array([-0.5, 0.5]))
    F = rng.randn(5, 1)
    m = np.asarray(lik.conditional_mean(F))
    v = np.asarray(lik.conditional_variance(F))
    probs = np.stack(
        [
            np.exp(np.asarray(lik.logp(jnp.asarray(F), np.full((5, 1), b))))
            for b in range(3)
        ],
        axis=-1,
    )[:, 0, :]  # (5, 3)
    ys = np.arange(3.0)
    m_bf = (probs * ys).sum(1, keepdims=True)
    v_bf = (probs * ys**2).sum(1, keepdims=True) - m_bf**2
    np.testing.assert_allclose(m, m_bf, atol=1e-4)
    np.testing.assert_allclose(v, v_bf, atol=1e-4)


def test_poisson_binsize():
    lik = Poisson(binsize=2.5)
    Y = rng.poisson(1.0, (N, 1)).astype(float)
    ve = np.asarray(lik.variational_expectations(Fmu, Fvar, Y))
    lik._testY = Y
    ve_q = np.asarray(Likelihood.variational_expectations(lik, Fmu, Fvar, Y))
    np.testing.assert_allclose(ve, ve_q, atol=1e-6)


def test_switched_likelihood_nan_safe_with_restricted_support():
    # a Gaussian output may carry negative y; the Gamma sub-likelihood must
    # never poison those rows through the mask (NaN*0 == NaN regression)
    lik = SwitchedLikelihood([Gaussian(variance=0.1), Gamma()])
    F = rng.randn(6, 1)
    Ydata = np.array([[-1.2], [0.5], [-0.3], [2.0], [1.1], [-0.7]])
    ind = np.array([0, 1, 0, 1, 1, 0], dtype=float)[:, None]
    Y = np.concatenate([Ydata, ind], axis=1)
    lp = np.asarray(lik.logp(jnp.asarray(F), jnp.asarray(Y)))
    assert np.isfinite(lp).all()
    ve = np.asarray(lik.variational_expectations(Fmu[:6], Fvar[:6],
                                                 jnp.asarray(Y)))
    assert np.isfinite(ve).all()
    # gradients are NaN-free too
    g = jax.grad(lambda f: jnp.sum(lik.logp(f, jnp.asarray(Y))))(
        jnp.asarray(F))
    assert np.isfinite(np.asarray(g)).all()
