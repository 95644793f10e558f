"""GPLVM / BayesianGPLVM: oracle identities, training, shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu.models import GPLVM, BayesianGPLVM, GPR, SGPR, pca_reduce

rng = np.random.RandomState(0)


def make_Y(N=20, P=5, Q=2):
    X = rng.randn(N, Q)
    W = rng.randn(Q, P)
    return X, X @ W + 0.05 * rng.randn(N, P)


def test_pca_reduce_shapes_and_variance_order():
    _, Y = make_Y()
    Xr = pca_reduce(Y, 2)
    assert Xr.shape == (20, 2)
    v = Xr.var(axis=0)
    assert v[0] >= v[1]  # components ordered by explained variance


def test_gplvm_matches_gpr_at_same_inputs():
    """With latents frozen at X, GPLVM's marginal likelihood IS GPR's."""
    X, Y = make_Y()
    kern = gfs.kernels.RBF(2, variance=1.3, lengthscales=0.8)
    m_lvm = GPLVM(Y, 2, X_mean=X, kern=kern)
    kern2 = gfs.kernels.RBF(2, variance=1.3, lengthscales=0.8)
    m_gpr = GPR(X, Y, kern=kern2)
    np.testing.assert_allclose(
        float(m_lvm.build_likelihood()), float(m_gpr.build_likelihood()),
        rtol=1e-10,
    )
    # predictions agree too
    Xnew = rng.randn(7, 2)
    m1, v1 = m_lvm.predict_f(jnp.asarray(Xnew))
    m2, v2 = m_gpr.predict_f(jnp.asarray(Xnew))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-10)


def test_gplvm_latents_receive_gradients_and_training_improves():
    _, Y = make_Y(N=15)
    m = GPLVM(Y, 2)
    loss0, grads = jax.value_and_grad(lambda mm: mm.objective())(m)
    gX = np.asarray(grads.X.unconstrained)
    assert np.any(gX != 0.0)

    opt = optax.adam(1e-2)
    mask = gfs.params.trainable_leaf_mask(m)
    leaves, treedef = jax.tree_util.tree_flatten(m)
    state = opt.init(leaves)

    @jax.jit
    def step(leaves, state):
        mm = jax.tree_util.tree_unflatten(treedef, leaves)
        loss, g = jax.value_and_grad(lambda q: q.objective())(mm)
        gl = jax.tree_util.tree_leaves(g)
        gl = [gi if mi else jnp.zeros_like(gi) for gi, mi in zip(gl, mask)]
        upd, state = opt.update(gl, state)
        return [l + u for l, u in zip(leaves, upd)], state, loss

    for _ in range(60):
        leaves, state, loss = step(leaves, state)
    assert float(loss) < float(loss0)


def test_bgplvm_reduces_to_sgpr_as_xvar_vanishes():
    """As q(X) collapses (X_var → 0), ψ1→Kuf, Σψ2→KufKufᵀ, ψ0→ΣKdiag, so
    ELBO + KL must equal the SGPR (Titsias) bound at X = X_mean, same Z."""
    X, Y = make_Y(N=18)
    Z = X[:6].copy()
    kern = gfs.kernels.RBF(2, variance=1.2, lengthscales=0.9)
    m = BayesianGPLVM(X, np.full_like(X, 1e-5), Y, kern, Z=Z)
    elbo_plus_kl = float(m.build_likelihood() + m.kl_latents())

    kern2 = gfs.kernels.RBF(2, variance=1.2, lengthscales=0.9)
    sgpr = SGPR(X, Y, kern=kern2, Z=Z)
    np.testing.assert_allclose(
        elbo_plus_kl, float(sgpr.build_likelihood()), rtol=1e-3,
    )


def test_bgplvm_elbo_below_gpr_loglik():
    """The collapsed bound (with flat-enough prior removed via KL ≥ 0
    argument) must sit below the exact marginal likelihood at X_mean when
    X_var → 0 (bound ≤ SGPR ≤ GPR)."""
    X, Y = make_Y(N=16)
    kern = gfs.kernels.RBF(2)
    m = BayesianGPLVM(X, np.full_like(X, 1e-5), Y, kern, M=5)
    kern2 = gfs.kernels.RBF(2)
    gpr = GPR(X, Y, kern=kern2)
    assert float(m.build_likelihood() + m.kl_latents()) <= float(
        gpr.build_likelihood()
    ) + 1e-8


def test_bgplvm_oracle_bound_numpy():
    """Independent numpy implementation of the Titsias BGPLVM bound."""
    from scipy.linalg import cholesky as npchol, solve_triangular

    X, Y = make_Y(N=12, P=3)
    Xvar = 0.05 + 0.1 * rng.rand(*X.shape)
    Z = rng.randn(5, 2)
    var, ls = 1.4, 0.7
    kern = gfs.kernels.RBF(2, variance=var, lengthscales=ls)
    m = BayesianGPLVM(X, Xvar, Y, kern, Z=Z)
    got = float(m.build_likelihood())

    # numpy psi stats (diagonal Σ, isotropic lengthscale)
    N, Q = X.shape
    M = Z.shape[0]
    ls2 = np.full(Q, ls**2)
    psi0 = N * var
    d1 = Xvar + ls2[None, :]
    psi1 = var * np.exp(
        -0.5 * np.sum((X[:, None, :] - Z[None, :, :]) ** 2
                      / d1[:, None, :], axis=-1)
        - 0.5 * np.sum(np.log(Xvar / ls2 + 1.0), axis=-1)[:, None]
    )
    Zbar = 0.5 * (Z[:, None, :] + Z[None, :, :])
    dZ = np.sum((Z[:, None, :] - Z[None, :, :]) ** 2 / ls2, axis=-1)
    d2 = Xvar[:, None, None, :] + 0.5 * ls2[None, None, None, :]
    quad = np.sum((X[:, None, None, :] - Zbar[None]) ** 2 / d2, axis=-1)
    ld2 = np.sum(np.log(2 * Xvar / ls2 + 1.0), axis=-1)
    psi2 = var**2 * np.exp(
        -0.25 * dZ[None] - 0.5 * quad - 0.5 * ld2[:, None, None]
    )
    Psi2 = psi2.sum(0)

    jit = gfs.config.default_jitter()
    sq = np.sum((Z / ls) ** 2, 1)
    Kuu = var * np.exp(-0.5 * np.maximum(
        sq[:, None] - 2 * (Z / ls) @ (Z / ls).T + sq[None, :], 0)) \
        + jit * np.eye(M)
    sigma2 = float(np.squeeze(np.asarray(m.likelihood.variance.value)))
    L = npchol(Kuu, lower=True)
    A = solve_triangular(L, psi1.T, lower=True) / np.sqrt(sigma2)
    tmp = solve_triangular(L, Psi2, lower=True)
    AAT = solve_triangular(L, tmp.T, lower=True) / sigma2
    B = AAT + np.eye(M)
    LB = npchol(B, lower=True)
    c = solve_triangular(LB, A @ np.asarray(Y), lower=True) / np.sqrt(sigma2)
    D = Y.shape[1]
    ND = N * D
    bound = (
        -0.5 * ND * np.log(2 * np.pi)
        - D * np.sum(np.log(np.diag(LB)))
        - 0.5 * ND * np.log(sigma2)
        - 0.5 * np.sum(np.asarray(Y) ** 2) / sigma2
        + 0.5 * np.sum(c**2)
        - 0.5 * D * (psi0 / sigma2 - np.trace(AAT))
    )
    kl = (
        -0.5 * N * Q
        - 0.5 * np.sum(np.log(Xvar))
        + 0.5 * np.sum(X**2 + Xvar)
    )
    np.testing.assert_allclose(got, bound - kl, rtol=1e-8)


def test_bgplvm_predict_shapes_and_training():
    X, Y = make_Y(N=14, P=3)
    kern = gfs.kernels.RBF(2)
    m = BayesianGPLVM(X + 0.1 * rng.randn(*X.shape),
                      np.full_like(X, 0.1), Y, kern, M=6)
    mu, v = m.predict_f(jnp.asarray(rng.randn(4, 2)))
    assert mu.shape == (4, 3) and v.shape == (4, 3)
    mu2, v2 = m.predict_f_full_cov(jnp.asarray(rng.randn(4, 2)))
    assert v2.shape == (3, 4, 4)

    loss0 = float(m.objective())
    opt = optax.adam(1e-2)
    leaves, treedef = jax.tree_util.tree_flatten(m)
    state = opt.init(leaves)

    @jax.jit
    def step(leaves, state):
        mm = jax.tree_util.tree_unflatten(treedef, leaves)
        loss, g = jax.value_and_grad(lambda q: q.objective())(mm)
        upd, state = opt.update(jax.tree_util.tree_leaves(g), state)
        return [l + u for l, u in zip(leaves, upd)], state, loss

    for _ in range(50):
        leaves, state, loss = step(leaves, state)
    assert float(loss) < loss0


def test_bgplvm_nonrbf_kernel_quadrature_path():
    """Matérn32 BGPLVM runs through the quadrature ψ-stats and trains."""
    X, Y = make_Y(N=10, P=2)
    kern = gfs.kernels.Matern32(2)
    m = BayesianGPLVM(X, np.full_like(X, 0.05), Y, kern, M=4)
    val = float(m.build_likelihood())
    assert np.isfinite(val)
    g = jax.grad(lambda mm: mm.objective())(m)
    assert np.all(np.isfinite(np.asarray(g.X_mean.unconstrained)))
