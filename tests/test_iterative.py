"""Iterative (CG/SLQ/BBMM) inference vs Cholesky oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu.ops import iterative as it

rng = np.random.RandomState(0)


def gp_system(N=200, noise=0.3):
    X = rng.uniform(0, 1, (N, 1))
    k = gfs.kernels.RBF(1, lengthscales=0.3)
    K = np.asarray(k.K(jnp.asarray(X))) + noise * np.eye(N)
    return jnp.asarray(K), X


def test_batched_cg_solves():
    K, _ = gp_system()
    B = jnp.asarray(rng.randn(200, 4))
    X, res = it.batched_cg(lambda v: K @ v, B, max_iters=300)
    assert np.asarray(res).max() < 1e-6
    np.testing.assert_allclose(
        np.asarray(K @ X), np.asarray(B), atol=1e-5
    )


def test_preconditioned_cg_converges_faster():
    K, _ = gp_system(noise=0.05)
    B = jnp.asarray(rng.randn(200, 2))
    # precondition with the pivoted Cholesky of the KERNEL part (A = Kk+σ²I)
    L = it.pivoted_cholesky(K - 0.05 * jnp.eye(200), 40)
    pre = it.woodbury_solve_fn(L, 0.05)
    _, res_pre = it.batched_cg(lambda v: K @ v, B, max_iters=5, precond=pre)
    _, res_plain = it.batched_cg(lambda v: K @ v, B, max_iters=5)
    assert np.asarray(res_pre).max() < 1e-8 < np.asarray(res_plain).max()


def test_lanczos_quadrature_exact_per_probe():
    K, _ = gp_system(N=100)
    lam, U = np.linalg.eigh(np.asarray(K))
    logK = U @ np.diag(np.log(lam)) @ U.T
    z = np.asarray(
        jax.random.rademacher(jax.random.PRNGKey(0), (100,),
                              dtype=jnp.float64)
    )
    alphas, betas = it.lanczos_tridiag(lambda v: K @ v, jnp.asarray(z), 40)
    T = (np.diag(np.asarray(alphas)) + np.diag(np.asarray(betas), 1)
         + np.diag(np.asarray(betas), -1))
    lamT, UT = np.linalg.eigh(T)
    est = 100 * np.sum(UT[0, :] ** 2 * np.log(np.maximum(lamT, 1e-12)))
    exact = float(z @ logK @ z)
    assert abs(est - exact) / abs(exact) < 1e-6


def test_slq_logdet_within_mc_error():
    K, _ = gp_system(N=150)
    true = float(jnp.linalg.slogdet(K)[1])
    est = float(it.slq_logdet(lambda v: K @ v, 150, jax.random.PRNGKey(1),
                              num_probes=64, num_steps=30,
                              dtype=jnp.float64))
    assert abs(est - true) / abs(true) < 0.15


def test_pivoted_cholesky_low_rank_recovery():
    # exactly rank-5 matrix is recovered exactly at rank 5
    A = rng.randn(80, 5)
    K = jnp.asarray(A @ A.T)
    L = it.pivoted_cholesky(K, 5)
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(K), atol=1e-8)


def test_gprcg_matches_gpr_value_and_predictions():
    N = 200
    X = rng.uniform(0, 1, (N, 1))
    Y = np.sin(6 * X) + 0.3 * rng.randn(N, 1)
    gpr = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3))
    cg = gfs.models.GPRCG(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3),
                          num_probes=64, slq_steps=30)
    l1 = float(gpr.build_likelihood())
    l2 = float(cg.build_likelihood())
    assert abs(l1 - l2) / abs(l1) < 0.02  # SLQ MC error

    Xt = np.linspace(0, 1, 15)[:, None]
    m1, v1 = gpr.predict_f(Xt)
    m2, v2 = cg.predict_f(Xt)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_gprcg_noise_gradient_matches():
    # data-fit-dominated gradients are near-deterministic
    N = 150
    X = rng.uniform(0, 1, (N, 1))
    Y = np.sin(6 * X) + 0.3 * rng.randn(N, 1)
    gpr = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3))
    cg = gfs.models.GPRCG(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3),
                          num_probes=128, slq_steps=30)
    g1 = jax.grad(lambda m: m.objective())(gpr)
    g2 = jax.grad(lambda m: m.objective())(cg)
    a = float(g1.likelihood.variance.unconstrained)
    b = float(g2.likelihood.variance.unconstrained)
    assert abs(a - b) / (abs(a) + 1e-9) < 0.05


def test_gprcg_trains_to_similar_hypers():
    N = 250
    X = rng.uniform(0, 1, (N, 1))
    Y = np.sin(6 * X) + 0.2 * rng.randn(N, 1)
    gpr = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3))
    cg = gfs.models.GPRCG(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3),
                          num_probes=32, slq_steps=25)
    gpr2, _ = gfs.training.fit(gpr, num_steps=200, learning_rate=0.05)
    cg2, _ = gfs.training.fit(cg, num_steps=200, learning_rate=0.05)
    n1 = float(np.squeeze(gpr2.likelihood.variance.value))
    n2 = float(np.squeeze(cg2.likelihood.variance.value))
    # both should find noise ≈ 0.04; agree within stochastic-gradient slack
    assert abs(np.log(n1) - np.log(n2)) < 0.5
    l1 = float(gpr2.build_likelihood())
    # evaluate cg2's hypers under the exact likelihood
    gpr_eval = gfs.models.GPR(X, Y, kern=cg2.kern)
    gpr_eval.likelihood = cg2.likelihood
    l2 = float(gpr_eval.build_likelihood())
    assert l2 > l1 - 5.0


def test_pivoted_cholesky_never_repicks_pivot():
    # regression: the -inf sentinel was resurrected by the >=0 clip, letting
    # rank-deficient inputs re-pick an old pivot
    A = rng.randn(30, 3)
    K = jnp.asarray(A @ A.T)  # rank 3, requested rank 8
    L = it.pivoted_cholesky(K, 8)
    assert np.isfinite(np.asarray(L)).all()
    # residual stays at the rank-3 floor; extra columns are ~0, not garbage
    resid = np.abs(np.asarray(K - L @ L.T)).max()
    assert resid < 1e-6
    extra_norm = np.abs(np.asarray(L[:, 3:])).max()
    assert extra_norm < 1e-3


def test_streaming_mode_matches_materialized():
    """materialize_k=False must give the same objective and gradients
    (same CG/SLQ seeds; only the matvec implementation differs)."""
    import jax

    from gpflow_slim_tpu.models import GPRCG

    rng2 = np.random.RandomState(0)
    N = 150
    X = rng2.uniform(0, 1, (N, 1))
    Y = np.sin(6 * X) + 0.1 * rng2.randn(N, 1)

    def make(mat):
        return GPRCG(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3),
                     cg_iters=60, materialize_k=mat)

    m_mat, m_str = make(True), make(False)
    v1, g1 = jax.value_and_grad(lambda m: m.objective())(m_mat)
    v2, g2 = jax.value_and_grad(lambda m: m.objective())(m_str)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    l1 = jax.tree_util.tree_leaves(g1)
    l2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    # predictions agree too
    Xs = rng2.uniform(0, 1, (7, 1))
    mu1, v1p = m_mat.predict_f(Xs)
    mu2, v2p = m_str.predict_f(Xs)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1p), np.asarray(v2p), atol=1e-6)
