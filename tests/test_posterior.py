"""Posterior caches, robust Cholesky, full-cov conditionals, multi-output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu.ops import linalg

rng = np.random.RandomState(0)


def test_gpr_posterior_matches_model():
    X = rng.uniform(0, 1, (40, 1))
    Y = np.sin(6 * X) + 0.1 * rng.randn(40, 1)
    m = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3))
    post = m.posterior()
    Xt = np.linspace(0, 1, 13)[:, None]
    for full in (False, True):
        a = m.build_predict(Xt, full_cov=full)
        b = post.predict_f(Xt, full_cov=full)
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                   atol=1e-10)
    ya = m.predict_y(Xt)
    yb = post.predict_y(Xt)
    np.testing.assert_allclose(np.asarray(ya[1]), np.asarray(yb[1]),
                               atol=1e-10)


def test_sgpr_posterior_matches_model():
    X = rng.uniform(0, 1, (50, 1))
    Y = np.sin(6 * X) + 0.1 * rng.randn(50, 1)
    m = gfs.models.SGPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3),
                        Z=np.linspace(0, 1, 9)[:, None])
    post = m.posterior()
    Xt = np.linspace(0, 1, 11)[:, None]
    for full in (False, True):
        a = m.build_predict(Xt, full_cov=full)
        b = post.predict_f(Xt, full_cov=full)
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                   atol=1e-10)


def test_posterior_checkpoint_roundtrip(tmp_path):
    from gpflow_slim_tpu import utils

    X = rng.uniform(0, 1, (30, 1))
    Y = np.sin(6 * X) + 0.1 * rng.randn(30, 1)
    m = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1))
    post = m.posterior()
    p = utils.save_checkpoint(str(tmp_path / "post"), post)
    post2 = utils.load_checkpoint(p, post)
    Xt = np.linspace(0, 1, 7)[:, None]
    np.testing.assert_allclose(
        np.asarray(post.predict_f(Xt)[0]),
        np.asarray(post2.predict_f(Xt)[0]), atol=1e-12,
    )


def test_robust_cholesky_escalates_jitter():
    # a singular matrix: plain cholesky fails, robust one succeeds
    A = rng.randn(20, 5)
    K = jnp.asarray(A @ A.T)  # rank 5 — not PD
    L_plain = linalg.cholesky(K)
    assert not bool(jnp.all(jnp.isfinite(L_plain)))
    L, jit_used = linalg.robust_cholesky(K)
    assert bool(jnp.all(jnp.isfinite(L)))
    resid = np.abs(np.asarray(L @ L.T - K)).max()
    assert resid < 10 * float(jit_used) + 1e-6


def test_robust_cholesky_no_extra_jitter_when_healthy():
    A = rng.randn(15, 15)
    K = jnp.asarray(A @ A.T + 15 * np.eye(15))
    L, jit_used = linalg.robust_cholesky(K)
    # first attempt should succeed => jitter stays at the base level
    assert float(jit_used) < 1e-4 * float(jnp.mean(jnp.diagonal(K))) * 10


def test_full_cov_conditional_with_q_sqrt_vs_brute_force():
    from gpflow_slim_tpu.conditionals import base_conditional

    M, Ns, P = 5, 4, 2
    Z = rng.randn(M, 1)
    Xt = rng.randn(Ns, 1)
    k = gfs.kernels.RBF(1, lengthscales=0.8)
    Kmm = np.asarray(k.K(jnp.asarray(Z))) + 1e-6 * np.eye(M)
    Kmn = np.asarray(k.K(jnp.asarray(Z), jnp.asarray(Xt)))
    Knn = np.asarray(k.K(jnp.asarray(Xt)))
    q_mu = rng.randn(M, P)
    A = rng.randn(P, M, M) * 0.2
    q_sqrt = np.tril(A) + 0.5 * np.tile(np.eye(M), (P, 1, 1))

    mean, cov = base_conditional(
        jnp.asarray(Kmn), jnp.asarray(Kmm), jnp.asarray(Knn),
        jnp.asarray(q_mu), full_cov=True, q_sqrt=jnp.asarray(q_sqrt),
        white=False,
    )
    # brute force
    Kinv = np.linalg.inv(Kmm)
    mean_bf = Kmn.T @ Kinv @ q_mu
    np.testing.assert_allclose(np.asarray(mean), mean_bf, atol=1e-8)
    for p in range(P):
        S = q_sqrt[p] @ q_sqrt[p].T
        cov_bf = Knn - Kmn.T @ Kinv @ Kmn + Kmn.T @ Kinv @ S @ Kinv @ Kmn
        np.testing.assert_allclose(np.asarray(cov[p]), cov_bf, atol=1e-8)


def test_coregion_multioutput_with_switched_likelihood():
    # classic GPflow multi-output demo: stack two outputs with an index
    # column, Coregion ⊗ RBF kernel, SwitchedLikelihood with two noises
    N1, N2 = 30, 25
    X1 = rng.uniform(0, 1, (N1, 1))
    X2 = rng.uniform(0, 1, (N2, 1))
    Y1 = np.sin(6 * X1) + 0.05 * rng.randn(N1, 1)
    Y2 = 0.7 * np.sin(6 * X2) + 0.3 + 0.1 * rng.randn(N2, 1)

    X_aug = np.vstack([
        np.hstack([X1, np.zeros((N1, 1))]),
        np.hstack([X2, np.ones((N2, 1))]),
    ])
    Y_aug = np.vstack([
        np.hstack([Y1, np.zeros((N1, 1))]),
        np.hstack([Y2, np.ones((N2, 1))]),
    ])

    kern = gfs.kernels.RBF(1, active_dims=[0], lengthscales=0.3) * \
        gfs.kernels.Coregion(1, output_dim=2, rank=1, active_dims=[1],
                             W=rng.randn(2, 1) * 0.1)
    lik = gfs.likelihoods.SwitchedLikelihood(
        [gfs.likelihoods.Gaussian(0.05), gfs.likelihoods.Gaussian(0.05)]
    )
    m = gfs.models.VGP(X_aug, Y_aug[:, :1], kern=kern, likelihood=lik)
    # hand Y with index column to the likelihood path
    m.Y = jnp.asarray(Y_aug)
    before = float(m.objective())
    m2, _ = gfs.training.fit(m, num_steps=150, learning_rate=0.05)
    after = float(m2.objective())
    assert after < before - 5
    # predictions at output-0 points track Y1
    Xt = np.hstack([X1, np.zeros((N1, 1))])
    mu, _ = m2.predict_f(Xt)
    corr = np.corrcoef(np.asarray(mu)[:, 0], Y1[:, 0])[0, 1]
    assert corr > 0.9


def test_svgp_posterior_matches_model():
    X = rng.uniform(0, 1, (40, 1))
    Y = (np.sin(8 * X) > 0).astype(float)
    for q_diag, whiten in [(False, True), (False, False), (True, True)]:
        m = gfs.models.SVGP(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3),
                            likelihood=gfs.likelihoods.Bernoulli(),
                            Z=np.linspace(0, 1, 8)[:, None],
                            q_diag=q_diag, whiten=whiten)
        m, _ = gfs.training.fit(m, num_steps=30, learning_rate=0.05)
        post = m.posterior()
        Xt = np.linspace(0, 1, 9)[:, None]
        a = m.predict_f(Xt)
        b = post.predict_f(Xt)
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                   atol=1e-9)
