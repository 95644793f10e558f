"""End-to-end exact GPR parity vs hand-written numpy oracle.

Mirrors the reference test strategy (SURVEY §4): numpy reference
implementations on small data, f64, tight tolerances. Exit criterion of the
minimum slice = BASELINE config #1 (1D GPR, RBF, N=500 sinusoid).
"""

import numpy as np
import pytest

import gpflow_slim_tpu as gfs


def numpy_rbf(X, X2, variance, lengthscales):
    Xs = X / lengthscales
    X2s = X2 / lengthscales
    d2 = (
        np.sum(Xs**2, 1)[:, None]
        - 2 * Xs @ X2s.T
        + np.sum(X2s**2, 1)[None, :]
    )
    return variance * np.exp(-0.5 * np.maximum(d2, 0))


def numpy_gpr_logmarg(X, Y, variance, lengthscales, noise):
    N = X.shape[0]
    K = numpy_rbf(X, X, variance, lengthscales) + noise * np.eye(N)
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L, Y)
    return float(
        -0.5 * N * Y.shape[1] * np.log(2 * np.pi)
        - Y.shape[1] * np.sum(np.log(np.diag(L)))
        - 0.5 * np.sum(alpha**2)
    )


def make_data(N=50, D=1, P=1, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform(0, 1, (N, D))
    Y = np.sin(12 * X[:, :1]) + 0.66 * np.cos(25 * X[:, :1]) + rng.randn(N, 1) * 0.1
    if P > 1:
        Y = np.tile(Y, (1, P)) + 0.01 * rng.randn(N, P)
    return X, Y


def test_gpr_log_marginal_matches_numpy_oracle():
    X, Y = make_data(N=50)
    k = gfs.kernels.RBF(1, variance=1.7, lengthscales=0.3)
    m = gfs.models.GPR(X, Y, kern=k)
    # set the noise explicitly
    noise = float(np.squeeze(m.likelihood.variance.value))
    ours = float(m.build_likelihood())
    oracle = numpy_gpr_logmarg(X, Y, 1.7, 0.3, noise)
    assert abs(ours - oracle) < 1e-8


def test_gpr_multioutput_log_marginal():
    X, Y = make_data(N=30, P=3)
    k = gfs.kernels.RBF(1, variance=0.9, lengthscales=0.25)
    m = gfs.models.GPR(X, Y, kern=k)
    noise = float(np.squeeze(m.likelihood.variance.value))
    ours = float(m.build_likelihood())
    oracle = numpy_gpr_logmarg(X, Y, 0.9, 0.25, noise)
    assert abs(ours - oracle) < 1e-8


def test_gpr_predict_matches_numpy():
    X, Y = make_data(N=40)
    Xnew = np.linspace(-0.2, 1.2, 17)[:, None]
    var, ls, noise = 1.3, 0.4, 0.05
    k = gfs.kernels.RBF(1, variance=var, lengthscales=ls)
    m = gfs.models.GPR(X, Y, kern=k)
    m = gfs.params.tree_at(
        lambda t: t.likelihood.variance,
        m,
        gfs.params.Param(noise, transform=gfs.transforms.positive(),
                         name="noise"),
    )
    fmean, fvar = m.predict_f(Xnew)

    K = numpy_rbf(X, X, var, ls) + noise * np.eye(len(X))
    Ks = numpy_rbf(X, Xnew, var, ls)
    Kinv = np.linalg.inv(K)
    mean_np = Ks.T @ Kinv @ Y
    var_np = var - np.sum(Ks * (Kinv @ Ks), axis=0)

    np.testing.assert_allclose(np.asarray(fmean), mean_np, atol=1e-8)
    np.testing.assert_allclose(np.asarray(fvar)[:, 0], var_np, atol=1e-8)

    # full_cov consistency: diagonal of (P,N,N) equals diag prediction
    fmean2, fcov = m.predict_f_full_cov(Xnew)
    np.testing.assert_allclose(np.asarray(fmean2), mean_np, atol=1e-8)
    np.testing.assert_allclose(
        np.diagonal(np.asarray(fcov)[0]), var_np, atol=1e-8
    )


def test_gpr_predict_y_adds_noise():
    X, Y = make_data(N=25)
    k = gfs.kernels.RBF(1)
    m = gfs.models.GPR(X, Y, kern=k)
    fmean, fvar = m.predict_f(X)
    ymean, yvar = m.predict_y(X)
    noise = float(np.squeeze(m.likelihood.variance.value))
    np.testing.assert_allclose(np.asarray(ymean), np.asarray(fmean), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(yvar), np.asarray(fvar) + noise, atol=1e-12
    )


def test_gpr_adam_fit_decreases_objective_config1():
    # BASELINE config #1: 1D GPR, RBF, N=500 synthetic sinusoid + Adam fit
    X, Y = make_data(N=500)
    k = gfs.kernels.RBF(1)
    m = gfs.models.GPR(X, Y, kern=k)
    before = float(m.objective())
    m2, losses = gfs.training.fit(m, num_steps=200, learning_rate=0.05)
    after = float(m2.objective())
    assert after < before - 1.0
    # losses[-1] is the loss evaluated just before the final update
    assert abs(float(losses[-1]) - after) < 0.1
    # fitted noise should be near the true 0.1² scale
    fitted_noise = float(np.squeeze(m2.likelihood.variance.value))
    assert 1e-4 < fitted_noise < 0.3


def test_gpr_lbfgs_fit():
    X, Y = make_data(N=100)
    k = gfs.kernels.RBF(1)
    m = gfs.models.GPR(X, Y, kern=k)
    before = float(m.objective())
    m2, losses = gfs.training.fit_lbfgs(m, num_steps=50)
    assert float(m2.objective()) < before - 1.0


def test_gpr_prior_contributes_to_objective():
    X, Y = make_data(N=20)
    k = gfs.kernels.RBF(1)
    m = gfs.models.GPR(X, Y, kern=k)
    base_obj = float(m.objective())

    k2 = gfs.kernels.RBF(1)
    k2.variance = gfs.params.Param(
        1.0, transform=gfs.transforms.positive(),
        prior=gfs.priors.LogNormal(0.0, 1.0), name="variance",
    )
    m2 = gfs.models.GPR(X, Y, kern=k2)
    obj2 = float(m2.objective())
    # objective = -(loglik + logprior); difference equals -prior_logp
    prior_term = float(k2.variance.prior_logp())
    assert abs((obj2 - base_obj) + prior_term) < 1e-10


def test_predict_f_samples_moments():
    import jax

    X, Y = make_data(N=30)
    k = gfs.kernels.RBF(1, variance=1.0, lengthscales=0.3)
    m = gfs.models.GPR(X, Y, kern=k)
    Xnew = np.linspace(0, 1, 9)[:, None]
    samples = m.predict_f_samples(Xnew, 4000, jax.random.PRNGKey(0))
    assert samples.shape == (4000, 9, 1)
    fmean, fvar = m.predict_f(Xnew)
    emp_mean = np.mean(np.asarray(samples), axis=0)
    emp_var = np.var(np.asarray(samples), axis=0)
    np.testing.assert_allclose(emp_mean, np.asarray(fmean), atol=0.1)
    np.testing.assert_allclose(emp_var, np.asarray(fvar), atol=0.1)
