"""uncertain_conditional vs Monte-Carlo ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu.conditionals import base_conditional, \
    uncertain_conditional

rng = np.random.RandomState(0)


def setup(white, q_diag=False, M=6, D=2, P=2):
    Z = rng.randn(M, D)
    kern = gfs.kernels.RBF(D, variance=1.2, lengthscales=0.9)
    q_mu = jnp.asarray(rng.randn(M, P) * 0.5)
    if q_diag:
        q_sqrt = jnp.asarray(0.2 + 0.3 * rng.rand(M, P))
    else:
        A = rng.randn(P, M, M) * 0.1
        q_sqrt = jnp.asarray(np.tril(A) + 0.3 * np.eye(M))
    feat = gfs.features.InducingPoints(Z)
    return feat, kern, q_mu, q_sqrt


def mc_moments(feat, kern, q_mu, q_sqrt, Xmu, Xvar, white, S=150_000):
    # sample x* ~ N(Xmu, diag(Xvar)), compute conditional moments, average
    N, D = Xmu.shape
    key = jax.random.PRNGKey(0)
    xs = Xmu[None] + np.sqrt(Xvar)[None] * np.asarray(
        jax.random.normal(key, (S, N, D))
    )  # (S, N, D)
    Z = feat.Z.value
    M = Z.shape[0]
    jitter = gfs.config.default_jitter()
    Kmm = kern.K(Z) + jitter * jnp.eye(M, dtype=Z.dtype)

    def moments_at(x):  # x (N, D)
        Kmn = kern.K(Z, jnp.asarray(x))
        Knn = kern.Kdiag(jnp.asarray(x))
        m, v = base_conditional(Kmn, Kmm, Knn, q_mu, q_sqrt=q_sqrt,
                                white=white)
        return m, v

    ms, vs = jax.lax.map(moments_at, jnp.asarray(xs), batch_size=512)
    Em = np.asarray(jnp.mean(ms, axis=0))
    # law of total variance
    Ev = np.asarray(jnp.mean(vs, axis=0) + jnp.var(ms, axis=0))
    return Em, Ev


@pytest.mark.parametrize("white", [False, True])
def test_uncertain_conditional_matches_mc(white):
    feat, kern, q_mu, q_sqrt = setup(white)
    N = 4
    Xmu = rng.randn(N, 2) * 0.5
    Xvar = 0.05 + 0.15 * rng.rand(N, 2)
    mean, var = uncertain_conditional(
        jnp.asarray(Xmu), jnp.asarray(Xvar), feat, kern, q_mu, q_sqrt,
        white=white,
    )
    Em, Ev = mc_moments(feat, kern, q_mu, q_sqrt, Xmu, Xvar, white, S=60_000)
    np.testing.assert_allclose(np.asarray(mean), Em, atol=0.02)
    np.testing.assert_allclose(np.asarray(var), Ev, atol=0.03)


def test_uncertain_conditional_zero_variance_reduces_to_conditional():
    feat, kern, q_mu, q_sqrt = setup(white=False)
    N = 5
    Xmu = rng.randn(N, 2) * 0.5
    Xvar = np.full((N, 2), 1e-10)
    mean, var = uncertain_conditional(
        jnp.asarray(Xmu), jnp.asarray(Xvar), feat, kern, q_mu, q_sqrt,
        white=False,
    )
    Z = feat.Z.value
    M = Z.shape[0]
    Kmm = kern.K(Z) + gfs.config.default_jitter() * jnp.eye(M)
    m2, v2 = base_conditional(
        kern.K(Z, jnp.asarray(Xmu)), Kmm, kern.Kdiag(jnp.asarray(Xmu)),
        q_mu, q_sqrt=q_sqrt, white=False,
    )
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(v2), atol=1e-4)


def test_quadrature_path_matches_rbf_closed_form():
    """The generic GH-quadrature ψ-stats must agree with the RBF closed
    forms (same kernel, forced through the fallback)."""
    from gpflow_slim_tpu.conditionals import (_quadrature_psi_stats,
                                              _rbf_psi_stats)

    feat, kern, q_mu, q_sqrt = setup(white=False)
    N = 4
    Xmu = rng.randn(N, 2) * 0.5
    Xvar = 0.05 + 0.1 * rng.rand(N, 2)
    p0a, p1a, p2a = _rbf_psi_stats(kern, feat.Z.value, jnp.asarray(Xmu),
                                   jnp.asarray(Xvar))
    p0q, p1q, p2q = _quadrature_psi_stats(kern, feat.Z.value,
                                          jnp.asarray(Xmu),
                                          jnp.asarray(Xvar), H=30)
    np.testing.assert_allclose(np.asarray(p0q), np.asarray(p0a), atol=1e-8)
    np.testing.assert_allclose(np.asarray(p1q), np.asarray(p1a), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2q), np.asarray(p2a), atol=1e-6)


@pytest.mark.parametrize("white", [False, True])
def test_uncertain_conditional_matern_quadrature_matches_mc(white):
    """Non-RBF kernels route through the quadrature ψ-stats fallback."""
    Z = rng.randn(5, 2)
    kern = gfs.kernels.Matern32(2, variance=1.1, lengthscales=1.2)
    M, P = 5, 2
    q_mu = jnp.asarray(rng.randn(M, P) * 0.5)
    A = rng.randn(P, M, M) * 0.1
    q_sqrt = jnp.asarray(np.tril(A) + 0.3 * np.eye(M))
    feat = gfs.features.InducingPoints(Z)
    N = 3
    Xmu = rng.randn(N, 2) * 0.5
    Xvar = 0.05 + 0.1 * rng.rand(N, 2)
    mean, var = uncertain_conditional(
        jnp.asarray(Xmu), jnp.asarray(Xvar), feat, kern, q_mu, q_sqrt,
        white=white,
    )
    Em, Ev = mc_moments(feat, kern, q_mu, q_sqrt, Xmu, Xvar, white, S=60_000)
    np.testing.assert_allclose(np.asarray(mean), Em, atol=0.02)
    np.testing.assert_allclose(np.asarray(var), Ev, atol=0.03)


def test_full_covariance_matches_diag_when_diagonal():
    feat, kern, q_mu, q_sqrt = setup(white=False)
    N = 4
    Xmu = rng.randn(N, 2) * 0.5
    Xvar_diag = 0.05 + 0.15 * rng.rand(N, 2)
    Xvar_full = jnp.asarray(
        np.stack([np.diag(v) for v in Xvar_diag])
    )
    m1, v1 = uncertain_conditional(
        jnp.asarray(Xmu), jnp.asarray(Xvar_diag), feat, kern, q_mu, q_sqrt)
    m2, v2 = uncertain_conditional(
        jnp.asarray(Xmu), Xvar_full, feat, kern, q_mu, q_sqrt)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-8)


def test_full_covariance_matches_mc():
    feat, kern, q_mu, q_sqrt = setup(white=True)
    N = 3
    Xmu = rng.randn(N, 2) * 0.5
    A = rng.randn(N, 2, 2) * 0.2
    Sig = A @ np.swapaxes(A, 1, 2) + 0.05 * np.eye(2)
    mean, var = uncertain_conditional(
        jnp.asarray(Xmu), jnp.asarray(Sig), feat, kern, q_mu, q_sqrt,
        white=True)

    # MC over correlated inputs
    S = 60_000
    Ls = np.linalg.cholesky(Sig)
    eps = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (S, N, 2)))
    xs = Xmu[None] + np.einsum("ndk,snk->snd", Ls, eps)
    Z = feat.Z.value
    M = Z.shape[0]
    Kmm = kern.K(Z) + gfs.config.default_jitter() * jnp.eye(M)

    def moments_at(x):
        Kmn = kern.K(Z, jnp.asarray(x))
        Knn = kern.Kdiag(jnp.asarray(x))
        return base_conditional(Kmn, Kmm, Knn, q_mu, q_sqrt=q_sqrt,
                                white=True)

    ms, vs = jax.lax.map(moments_at, jnp.asarray(xs), batch_size=512)
    Em = np.asarray(jnp.mean(ms, axis=0))
    Ev = np.asarray(jnp.mean(vs, axis=0) + jnp.var(ms, axis=0))
    np.testing.assert_allclose(np.asarray(mean), Em, atol=0.02)
    np.testing.assert_allclose(np.asarray(var), Ev, atol=0.03)
