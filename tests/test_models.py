"""Cross-model consistency oracles (reference test_methods.py role, SURVEY §4).

The classic GPflow identities: SGPR(Z=X) ≡ GPR; FITC(Z=X) ≡ GPR; ELBOs lower-
bound the marginal likelihood; upper bound sandwiches it; whitened vs
non-whitened SVGP agree at matched parameterizations.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu import params, transforms


def make_data(N=30, D=2, P=1, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(N, D)
    Y = np.sin(X[:, :1]) + 0.1 * rng.randn(N, P)
    return X, Y


def make_kern():
    return gfs.kernels.RBF(2, variance=1.3, lengthscales=0.8)


def test_sgpr_with_Z_equals_X_matches_gpr():
    X, Y = make_data()
    gpr = gfs.models.GPR(X, Y, kern=make_kern())
    sgpr = gfs.models.SGPR(X, Y, kern=make_kern(), Z=X.copy())
    lml_gpr = float(gpr.build_likelihood())
    elbo = float(sgpr.build_likelihood())
    assert abs(lml_gpr - elbo) < 1e-4  # jitter-level agreement


def test_fitc_with_Z_equals_X_matches_gpr():
    X, Y = make_data()
    gpr = gfs.models.GPR(X, Y, kern=make_kern())
    fitc = gfs.models.GPRFITC(X, Y, kern=make_kern(), Z=X.copy())
    assert abs(float(gpr.build_likelihood()) - float(fitc.build_likelihood())) < 1e-4


def test_sgpr_elbo_below_lml_above_for_upper_bound():
    X, Y = make_data(N=40)
    Z = X[::4].copy()
    gpr = gfs.models.GPR(X, Y, kern=make_kern())
    sgpr = gfs.models.SGPR(X, Y, kern=make_kern(), Z=Z)
    lml = float(gpr.build_likelihood())
    elbo = float(sgpr.build_likelihood())
    upper = float(sgpr.compute_upper_bound())
    assert elbo <= lml + 1e-6
    assert lml <= upper + 1e-6


def test_sgpr_predict_matches_gpr_at_Z_equals_X():
    X, Y = make_data()
    Xnew = np.random.RandomState(3).randn(7, 2)
    gpr = gfs.models.GPR(X, Y, kern=make_kern())
    sgpr = gfs.models.SGPR(X, Y, kern=make_kern(), Z=X.copy())
    m1, v1 = gpr.predict_f(Xnew)
    m2, v2 = sgpr.predict_f(Xnew)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)


def _freeze(p):
    return params.Param(
        np.asarray(p.value), transform=p.transform, trainable=False,
        name=p.name,
    )


def test_svgp_elbo_lower_bounds_lml_after_training():
    X, Y = make_data(N=40)
    gpr = gfs.models.GPR(X, Y, kern=make_kern())
    svgp = gfs.models.SVGP(
        X, Y, kern=make_kern(), likelihood=gfs.likelihoods.Gaussian(),
        Z=X[::2].copy(),
    )
    # freeze hypers (and Z) so the bound is on the same marginal likelihood
    svgp.kern.variance = _freeze(svgp.kern.variance)
    svgp.kern.lengthscales = _freeze(svgp.kern.lengthscales)
    svgp.likelihood.variance = _freeze(svgp.likelihood.variance)
    svgp.feature.Z = _freeze(svgp.feature.Z)
    lml = float(gpr.build_likelihood())
    svgp2, _ = gfs.training.fit(svgp, num_steps=500, learning_rate=0.05)
    elbo = float(svgp2.build_likelihood())
    assert elbo <= lml + 1e-6
    assert elbo > lml - 20.0  # reasonably tight after training


def test_svgp_whitened_vs_unwhitened_matched_params():
    X, Y = make_data(N=20)
    rng = np.random.RandomState(5)
    M = 8
    Z = X[:M].copy()
    kern = make_kern()
    jitter = gfs.config.default_jitter()
    Kuu = np.asarray(kern.K(Z)) + jitter * np.eye(M)
    L = np.linalg.cholesky(Kuu)

    q_mu_white = rng.randn(M, 1)
    A = rng.randn(M, M) * 0.3
    q_sqrt_white = np.tril(A) + np.eye(M)  # well-conditioned lower tri

    white = gfs.models.SVGP(
        X, Y, kern=make_kern(), likelihood=gfs.likelihoods.Gaussian(),
        Z=Z, whiten=True,
    )
    unwhite = gfs.models.SVGP(
        X, Y, kern=make_kern(), likelihood=gfs.likelihoods.Gaussian(),
        Z=Z, whiten=False,
    )

    white.q_mu = params.Param(q_mu_white, name="q_mu")
    white.q_sqrt = params.Param(
        q_sqrt_white[None], transform=transforms.LowerTriangular(M, 1),
        name="q_sqrt",
    )
    # matched unwhitened params: q_mu' = L q_mu, q_sqrt' = L q_sqrt
    unwhite.q_mu = params.Param(L @ q_mu_white, name="q_mu")
    unwhite.q_sqrt = params.Param(
        (L @ q_sqrt_white)[None], transform=transforms.LowerTriangular(M, 1),
        name="q_sqrt",
    )

    e1 = float(white.build_likelihood())
    e2 = float(unwhite.build_likelihood())
    assert abs(e1 - e2) < 1e-5

    # predictions must agree too
    Xnew = rng.randn(6, 2)
    m1, v1 = white.predict_f(Xnew)
    m2, v2 = unwhite.predict_f(Xnew)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_svgp_qdiag_consistency():
    X, Y = make_data(N=20)
    M = 6
    Z = X[:M].copy()
    diag_vals = np.abs(np.random.RandomState(2).randn(M, 1)) + 0.3

    qd = gfs.models.SVGP(X, Y, kern=make_kern(),
                         likelihood=gfs.likelihoods.Gaussian(), Z=Z,
                         q_diag=True)
    qf = gfs.models.SVGP(X, Y, kern=make_kern(),
                         likelihood=gfs.likelihoods.Gaussian(), Z=Z,
                         q_diag=False)
    qd.q_sqrt = params.Param(diag_vals, transform=transforms.positive(),
                             name="q_sqrt")
    qf.q_sqrt = params.Param(
        np.diag(diag_vals[:, 0])[None],
        transform=transforms.LowerTriangular(M, 1), name="q_sqrt",
    )
    assert abs(float(qd.build_likelihood()) - float(qf.build_likelihood())) < 1e-8


def test_svgp_minibatch_elbo_unbiased():
    X, Y = make_data(N=32)
    svgp = gfs.models.SVGP(
        X, Y, kern=make_kern(), likelihood=gfs.likelihoods.Gaussian(),
        Z=X[:8].copy(),
    )
    full = float(svgp.build_likelihood())
    # average minibatch ELBO over a disjoint partition == full ELBO
    parts = [
        float(svgp.build_likelihood_batch(X[i::4], Y[i::4])) for i in range(4)
    ]
    assert abs(np.mean(parts) - full) < 1e-6


def test_vgp_optimal_approaches_gpr():
    X, Y = make_data(N=15)
    gpr = gfs.models.GPR(X, Y, kern=make_kern())
    noise = float(np.squeeze(gpr.likelihood.variance.value))
    vgp = gfs.models.VGP(
        X, Y, kern=make_kern(),
        likelihood=gfs.likelihoods.Gaussian(variance=noise),
    )
    lml = float(gpr.build_likelihood())
    # freeze hypers, train only q
    vgp.kern.variance = _freeze(vgp.kern.variance)
    vgp.kern.lengthscales = _freeze(vgp.kern.lengthscales)
    vgp.likelihood.variance = _freeze(vgp.likelihood.variance)
    vgp2, _ = gfs.training.fit(vgp, num_steps=2000, learning_rate=0.05)
    elbo = float(vgp2.build_likelihood())
    assert elbo <= lml + 1e-6
    assert elbo > lml - 0.5  # conjugate case: optimum equals lml


def test_gpmc_gaussian_logposterior_matches_analytic():
    X, Y = make_data(N=12)
    kern = make_kern()
    m = gfs.models.GPMC(X, Y, kern=kern,
                        likelihood=gfs.likelihoods.Gaussian(variance=0.3))
    # V = 0 => F = 0 => loglik = sum N(Y; 0, 0.3)
    expected = float(np.sum(
        -0.5 * np.log(2 * np.pi * 0.3) - 0.5 * Y**2 / 0.3
    ))
    assert abs(float(m.build_likelihood()) - expected) < 1e-8
    # log_posterior adds the V prior at V=0: sum logN(0;0,1)
    n_v = m.V.unconstrained.size
    expected_post = expected + n_v * float(-0.5 * np.log(2 * np.pi))
    assert abs(float(m.log_posterior()) - expected_post) < 1e-8


def test_sgpmc_matches_gpmc_at_Z_equals_X_mean():
    X, Y = make_data(N=12)
    lik = gfs.likelihoods.Gaussian(variance=0.2)
    gpmc = gfs.models.GPMC(X, Y, kern=make_kern(), likelihood=lik)
    sgpmc = gfs.models.SGPMC(X, Y, kern=make_kern(), likelihood=lik,
                             Z=X.copy())
    V = np.random.RandomState(0).randn(12, 1) * 0.5
    gpmc.V = params.Param(V, prior=gfs.priors.Gaussian(0.0, 1.0), name="V")
    sgpmc.V = params.Param(V, prior=gfs.priors.Gaussian(0.0, 1.0), name="V")
    # predictive means agree when Z=X (same whitened representation)
    Xnew = np.random.RandomState(1).randn(5, 2)
    m1, _ = gpmc.predict_f(Xnew)
    m2, _ = sgpmc.predict_f(Xnew)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-4)


def test_all_models_objective_grads_finite():
    X, Y = make_data(N=10)
    Z = X[:4].copy()
    lik = gfs.likelihoods.Gaussian()
    models = [
        gfs.models.GPR(X, Y, kern=make_kern()),
        gfs.models.SGPR(X, Y, kern=make_kern(), Z=Z),
        gfs.models.GPRFITC(X, Y, kern=make_kern(), Z=Z),
        gfs.models.SVGP(X, Y, kern=make_kern(), likelihood=lik, Z=Z),
        gfs.models.VGP(X, Y, kern=make_kern(), likelihood=lik),
        gfs.models.GPMC(X, Y, kern=make_kern(), likelihood=lik),
        gfs.models.SGPMC(X, Y, kern=make_kern(), likelihood=lik, Z=Z),
    ]
    for m in models:
        g = jax.grad(lambda mm: mm.objective())(m)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all(), type(m).__name__


def test_vgp_opper_archambeau_conjugate_matches_gpr():
    X, Y = make_data(N=15)
    gpr = gfs.models.GPR(X, Y, kern=make_kern())
    noise = float(np.squeeze(gpr.likelihood.variance.value))
    vgp = gfs.models.VGPOpperArchambeau(
        X, Y, kern=make_kern(),
        likelihood=gfs.likelihoods.Gaussian(variance=noise),
    )
    vgp.kern.variance = _freeze(vgp.kern.variance)
    vgp.kern.lengthscales = _freeze(vgp.kern.lengthscales)
    vgp.likelihood.variance = _freeze(vgp.likelihood.variance)
    lml = float(gpr.build_likelihood())
    assert float(vgp.build_likelihood()) <= lml + 1e-6
    vgp2, _ = gfs.training.fit(vgp, num_steps=3000, learning_rate=0.05)
    elbo = float(vgp2.build_likelihood())
    assert elbo <= lml + 1e-6
    assert elbo > lml - 0.5  # conjugate optimum reaches the exact lml

    # predictions at the optimum match exact GPR
    Xnew = np.random.RandomState(3).randn(6, 2)
    m1, v1 = gpr.predict_f(Xnew)
    m2, v2 = vgp2.predict_f(Xnew)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=0.05)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=0.05)


def test_vgp_opper_archambeau_classification():
    rng2 = np.random.RandomState(4)
    X = rng2.uniform(-1, 1, (40, 1))
    Y = (np.sin(4 * X) > 0).astype(float)
    m = gfs.models.VGPOpperArchambeau(
        X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.4),
        likelihood=gfs.likelihoods.Bernoulli(),
    )
    before = float(m.objective())
    m2, _ = gfs.training.fit(m, num_steps=500, learning_rate=0.05)
    assert float(m2.objective()) < before - 3
    p, _ = m2.predict_y(X)
    acc = float(np.mean((np.asarray(p) > 0.5) == (Y > 0.5)))
    assert acc > 0.85


def test_switched_mean_function():
    """SwitchedMeanFunction: last column of X selects the per-group mean."""
    import jax.numpy as jnp

    from gpflow_slim_tpu.mean_functions import (Constant, Linear,
                                                SwitchedMeanFunction)

    rng2 = np.random.RandomState(3)
    Xd = rng2.randn(9, 2)
    groups = np.array([0, 1, 0, 1, 1, 0, 1, 0, 0])
    X = np.concatenate([Xd, groups[:, None].astype(float)], axis=1)
    m0 = Constant(2.5)
    m1 = Linear(A=np.array([[1.0], [-1.0]]), b=np.array([0.5]))
    sw = SwitchedMeanFunction([m0, m1])
    out = np.asarray(sw(jnp.asarray(X)))
    exp0 = np.asarray(m0(jnp.asarray(Xd)))
    exp1 = np.asarray(m1(jnp.asarray(Xd)))
    for n in range(9):
        expected = exp0[n] if groups[n] == 0 else exp1[n]
        np.testing.assert_allclose(out[n], expected, atol=1e-12)


def test_vgp_switched_likelihood_and_mean_gradients_flow():
    """Grouped-data wiring (index in X's AND Y's last column) must deliver
    nonzero gradients to every per-group parameter."""
    import jax
    import jax.numpy as jnp

    from gpflow_slim_tpu.likelihoods import Gaussian, SwitchedLikelihood
    from gpflow_slim_tpu.mean_functions import (Constant,
                                                SwitchedMeanFunction)

    rng2 = np.random.RandomState(0)
    N = 30
    x = rng2.uniform(0, 1, (N, 1))
    group = (rng2.rand(N) < 0.5).astype(float)
    y = (np.sin(8 * x[:, 0]) + 1.5 * group + 0.1 * rng2.randn(N))[:, None]
    X = np.concatenate([x, group[:, None]], axis=1)
    Y = np.concatenate([y, group[:, None]], axis=1)

    lik = SwitchedLikelihood([Gaussian(name="g0"), Gaussian(name="g1")])
    mean = SwitchedMeanFunction([Constant(0.0, name="m0"),
                                 Constant(0.0, name="m1")])
    kern = gfs.kernels.RBF(1, active_dims=[0], lengthscales=0.2)
    m = gfs.models.VGP(X, Y, kern=kern, likelihood=lik, mean_function=mean,
                       num_latent=1)
    g = jax.grad(lambda mm: mm.objective())(m)
    for i in (0, 1):
        assert float(jnp.abs(
            g.likelihood.likelihood_list[i].variance.unconstrained)) > 0
        assert float(jnp.abs(
            jnp.sum(g.mean_function.meanfunctions[i].c.unconstrained))) > 0
