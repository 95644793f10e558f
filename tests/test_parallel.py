"""Sharding-layer tests on the 8-virtual-device CPU mesh (SURVEY §4):
single-chip-vs-sharded consistency, ring Gram, distributed Cholesky,
data-parallel SVGP, chain parallelism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu import parallel
from gpflow_slim_tpu.ops import blocked


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return parallel.make_mesh({"data": 8})


def test_blocked_cholesky_matches_xla():
    rng = np.random.RandomState(0)
    A = rng.randn(96, 96)
    K = A @ A.T + 96 * np.eye(96)
    L = np.asarray(blocked.blocked_cholesky(jnp.asarray(K), block_size=32))
    L_ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, L_ref, atol=1e-8)


def test_blocked_solves_match():
    rng = np.random.RandomState(1)
    A = rng.randn(64, 64)
    K = A @ A.T + 64 * np.eye(64)
    L = np.linalg.cholesky(K)
    B = rng.randn(64, 3)
    X1 = np.asarray(blocked.blocked_solve_lower(jnp.asarray(L), jnp.asarray(B),
                                                block_size=16))
    np.testing.assert_allclose(X1, np.linalg.solve(L, B), atol=1e-8)
    X2 = np.asarray(blocked.blocked_solve_upper(jnp.asarray(L.T),
                                                jnp.asarray(B), block_size=16))
    np.testing.assert_allclose(X2, np.linalg.solve(L.T, B), atol=1e-8)


def test_blocked_cholesky_grad_matches_xla():
    rng = np.random.RandomState(2)
    A = rng.randn(32, 32)
    K = jnp.asarray(A @ A.T + 32 * np.eye(32))

    def f_blocked(K):
        return jnp.sum(jnp.log(jnp.diagonal(
            blocked.blocked_cholesky(K, block_size=8))))

    def f_xla(K):
        return jnp.sum(jnp.log(jnp.diagonal(
            jax.scipy.linalg.cholesky(K, lower=True))))

    # gradient conventions differ in how sensitivity is split across the two
    # (redundant) triangles of the symmetric input; the contract is the
    # symmetrized gradient, which must equal XLA's and analytically ½K⁻¹
    g1 = np.asarray(jax.grad(f_blocked)(K))
    g2 = np.asarray(jax.grad(f_xla)(K))
    s1, s2 = 0.5 * (g1 + g1.T), 0.5 * (g2 + g2.T)
    np.testing.assert_allclose(s1, s2, atol=1e-10)
    np.testing.assert_allclose(
        s1, 0.5 * np.linalg.inv(np.asarray(K)), atol=1e-10
    )


def test_ring_gram_matches_direct(mesh):
    rng = np.random.RandomState(3)
    X = rng.randn(48, 2)
    kern = gfs.kernels.RBF(2, variance=1.4, lengthscales=0.7)
    K_ring = np.asarray(parallel.ring_gram(kern, jnp.asarray(X), mesh,
                                           axis="data"))
    K_direct = np.asarray(kern.K(jnp.asarray(X)))
    np.testing.assert_allclose(K_ring, K_direct, atol=1e-10)


def test_ring_gram_matvec(mesh):
    rng = np.random.RandomState(4)
    X = rng.randn(40, 2)
    v = rng.randn(40, 2)
    kern = gfs.kernels.Matern32(2)
    out = np.asarray(parallel.ring_gram_matvec(
        kern, jnp.asarray(X), jnp.asarray(v), mesh, axis="data", noise=0.3))
    expected = np.asarray(kern.K(jnp.asarray(X))) @ v + 0.3 * v
    np.testing.assert_allclose(out, expected, atol=1e-9)


def test_distributed_gpr_mll_matches_single_device(mesh):
    # bit-level single-vs-sharded consistency (same math, same layout)
    rng = np.random.RandomState(5)
    N = 64
    X = rng.uniform(0, 1, (N, 1))
    Y = np.sin(6 * X) + 0.1 * rng.randn(N, 1)
    m = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.4))
    lml_single = float(m.build_likelihood())
    loss_fn = parallel.make_distributed_gpr_loss(m, mesh, axis="data",
                                                 block_size=8)
    lml_dist = -float(jax.jit(loss_fn)(m))
    assert abs(lml_single - lml_dist) < 1e-8


def test_distributed_gpr_grad_matches_single_device(mesh):
    rng = np.random.RandomState(6)
    N = 32
    X = rng.uniform(0, 1, (N, 1))
    Y = np.sin(6 * X) + 0.1 * rng.randn(N, 1)
    m = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.4))
    g_single = jax.grad(lambda mm: mm.objective())(m)
    loss_fn = parallel.make_distributed_gpr_loss(m, mesh, axis="data",
                                                 block_size=8)
    g_dist = jax.jit(jax.grad(loss_fn))(m)
    for a, b, mask in zip(
        jax.tree_util.tree_leaves(g_single),
        jax.tree_util.tree_leaves(g_dist),
        gfs.params.trainable_leaf_mask(m),
    ):
        if mask:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)


def test_dp_svgp_grad_matches_single_device(mesh):
    rng = np.random.RandomState(7)
    N = 64
    X = rng.uniform(0, 1, (N, 2))
    Y = (np.sin(4 * X[:, :1]) > 0).astype(float)
    m = gfs.models.SVGP(X, Y, kern=gfs.kernels.RBF(2),
                        likelihood=gfs.likelihoods.Bernoulli(),
                        Z=X[:8].copy())
    Xb, Yb = jnp.asarray(X[:32]), jnp.asarray(Y[:32])

    def single_loss(mm):
        return -(mm.build_likelihood_batch(Xb, Yb) + mm.log_prior())

    l1, g1 = jax.value_and_grad(single_loss)(m)
    l2, g2 = jax.jit(
        lambda mm, xb, yb: parallel.dp_value_and_grad(mm, xb, yb, mesh,
                                                      axis="data")
    )(m, Xb, Yb)
    assert abs(float(l1) - float(l2)) < 1e-9
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)


def test_fit_svgp_sharded_trains(mesh):
    rng = np.random.RandomState(8)
    N = 256
    X = rng.uniform(0, 1, (N, 1))
    Y = (np.sin(8 * X) > 0).astype(float)
    m = gfs.models.SVGP(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3),
                        likelihood=gfs.likelihoods.Bernoulli(),
                        Z=np.linspace(0, 1, 16)[:, None])
    before = float(m.objective())
    m2, losses = parallel.fit_svgp(
        m, num_steps=200, key=jax.random.PRNGKey(0), learning_rate=0.05,
        batch_size=64, mesh=mesh, axis="data",
    )
    after = float(m2.objective())
    assert after < before - 5.0


def test_sharded_chains_match_moments(mesh):
    def lp(x):
        return jnp.sum(-0.5 * jnp.square(x - 2.0) / 0.5)

    C = 8
    x0s = jnp.zeros((C, 1))
    samples, info = parallel.sample_chains(
        lp, x0s, jax.random.PRNGKey(0), num_samples=500, sampler="nuts",
        mesh=mesh, axis="data", num_warmup=300,
    )
    s = np.asarray(samples)
    assert s.shape == (C, 500, 1)
    rhat = gfs.mcmc.potential_scale_reduction(s)
    assert rhat[0] < 1.05
    np.testing.assert_allclose(s.mean(), 2.0, atol=0.1)
    np.testing.assert_allclose(s.reshape(-1).var(), 0.5, rtol=0.3)
    # shared adaptation => all chains share the same (pmean'd) step size
    eps = np.asarray(info["step_size"])
    np.testing.assert_allclose(eps, eps[0], rtol=1e-6)


def test_vmap_chains_no_mesh():
    def lp(x):
        return jnp.sum(-0.5 * jnp.square(x))

    samples, info = parallel.sample_chains(
        lp, jnp.zeros((4, 2)), jax.random.PRNGKey(1), num_samples=300,
        sampler="hmc", epsilon=0.5, burn=100,
    )
    assert np.asarray(samples).shape == (4, 300, 2)


def test_nuts_over_distributed_gpr_logprob(mesh):
    # BASELINE north-star shape: NUTS hyperparameter sampling where each
    # log-posterior evaluation is the DISTRIBUTED marginal likelihood
    # (ring Gram + sharded blocked Cholesky) — the leapfrog hot loop runs
    # collectives inside the jitted sampler.
    rng = np.random.RandomState(9)
    N = 32
    X = rng.uniform(0, 1, (N, 1))
    Y = np.sin(6 * X) + 0.2 * rng.randn(N, 1)
    k = gfs.kernels.RBF(1, lengthscales=0.3)
    k.variance = gfs.params.Param(
        1.0, transform=gfs.transforms.positive(),
        prior=gfs.priors.LogNormal(0.0, 1.0), name="v")
    m = gfs.models.GPR(X, Y, kern=k)
    loss_fn = parallel.make_distributed_gpr_loss(m, mesh, axis="data",
                                                 block_size=8)
    v0, unpack = gfs.params.pack_trainable(m)

    def lp(v):
        return -loss_fn(unpack(v))

    samples, info = jax.jit(
        lambda key: gfs.mcmc.nuts(lp, v0, key, num_samples=30,
                                  num_warmup=30, max_depth=6)
    )(jax.random.PRNGKey(0))
    s = np.asarray(samples)
    assert np.isfinite(s).all()
    # the sampler actually moved
    assert np.std(s[:, 0]) > 1e-3


def test_dp_svgp_grad_matches_with_priors(mesh):
    # regression: log_prior entered dp_value_and_grad with the wrong sign
    rng = np.random.RandomState(11)
    N = 32
    X = rng.uniform(0, 1, (N, 1))
    Y = np.sin(4 * X) + 0.1 * rng.randn(N, 1)
    k = gfs.kernels.RBF(1)
    k.variance = gfs.params.Param(
        1.0, transform=gfs.transforms.positive(),
        prior=gfs.priors.LogNormal(0.0, 1.0), name="variance")
    m = gfs.models.SVGP(X, Y, kern=k, likelihood=gfs.likelihoods.Gaussian(),
                        Z=X[:4].copy())
    Xb, Yb = jnp.asarray(X), jnp.asarray(Y)

    def single_loss(mm):
        return -(mm.build_likelihood_batch(Xb, Yb) + mm.log_prior())

    l1, g1 = jax.value_and_grad(single_loss)(m)
    l2, g2 = jax.jit(
        lambda mm, xb, yb: parallel.dp_value_and_grad(mm, xb, yb, mesh,
                                                      axis="data")
    )(m, Xb, Yb)
    assert abs(float(l1) - float(l2)) < 1e-9
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)


def test_cyclic_cholesky_matches_numpy(mesh):
    rng = np.random.RandomState(12)
    N, bs = 128, 16
    A = rng.randn(N, N)
    K = jnp.asarray(A @ A.T + N * np.eye(N))
    Lref = np.linalg.cholesky(np.asarray(K))
    for look in (True, False):  # lookahead reorders, must not change math
        L = np.asarray(parallel.cyclic_cholesky(
            K, mesh, "data", block_size=bs, lookahead=look))
        np.testing.assert_allclose(L, Lref, atol=1e-10)


def test_cyclic_cholesky_differentiable(mesh):
    rng = np.random.RandomState(13)
    N, bs = 64, 8
    A = rng.randn(N, N)
    K = jnp.asarray(A @ A.T + N * np.eye(N))

    def f(K):
        L = parallel.cyclic_cholesky(K, mesh, "data", block_size=bs)
        return jnp.sum(jnp.log(jnp.diagonal(L)))

    g = np.asarray(jax.grad(f)(K))
    gs = 0.5 * (g + g.T)
    np.testing.assert_allclose(gs, 0.5 * np.linalg.inv(np.asarray(K)),
                               atol=1e-9)


def test_hmc_chains_shared_adaptation(mesh):
    def lp(x):
        return jnp.sum(-0.5 * jnp.square(x))

    samples, info = parallel.sample_chains(
        lp, jnp.zeros((8, 2)), jax.random.PRNGKey(2), num_samples=200,
        sampler="hmc", mesh=mesh, axis="data", epsilon=1e-3, burn=300,
        adapt_step_size=True,
    )
    eps = np.asarray(info["epsilon"])
    # pmean-shared dual averaging => identical adapted step size everywhere
    np.testing.assert_allclose(eps, eps.flat[0], rtol=1e-6)
    assert eps.flat[0] > 0.01  # adapted up from 1e-3


def test_distributed_gpr_with_mean_function(mesh):
    rng = np.random.RandomState(14)
    N = 32
    X = rng.uniform(0, 1, (N, 1))
    Y = 2.0 + np.sin(6 * X) + 0.1 * rng.randn(N, 1)
    mf = gfs.mean_functions.Constant(c=[1.5])
    m = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.4),
                       mean_function=mf)
    loss_fn = parallel.make_distributed_gpr_loss(m, mesh, axis="data",
                                                 block_size=8)
    assert abs(float(m.objective()) - float(jax.jit(loss_fn)(m))) < 1e-8
    # mean-function param gets a gradient through the distributed path
    g = jax.jit(jax.grad(loss_fn))(m)
    gc = float(np.squeeze(np.asarray(g.mean_function.c.unconstrained)))
    assert np.isfinite(gc) and abs(gc) > 1e-3


def test_distributed_cg_loss_matches_single_device_gprcg():
    """Ring-matvec CG/SLQ loss over an 8-device mesh == GPRCG on one
    device (same probe seeds; only the matvec parallelization differs),
    values AND hyperparameter gradients."""
    import jax

    from gpflow_slim_tpu.models import GPRCG
    from gpflow_slim_tpu import parallel

    rng2 = np.random.RandomState(0)
    N = 128
    X = rng2.uniform(0, 1, (N, 1))
    Y = np.sin(6 * X) + 0.1 * rng2.randn(N, 1)

    kern = gfs.kernels.RBF(1, lengthscales=0.3)
    m_ref = GPRCG(X, Y, kern=kern, cg_iters=60, num_probes=8,
                  slq_steps=20)
    v_ref, g_ref = jax.value_and_grad(lambda m: m.objective())(m_ref)

    mesh = parallel.make_mesh({"rows": 8})
    kern2 = gfs.kernels.RBF(1, lengthscales=0.3)
    m2 = GPRCG(X, Y, kern=kern2, cg_iters=60, num_probes=8, slq_steps=20)
    loss_fn = parallel.make_distributed_cg_loss(
        m2, mesh, axis="rows", num_probes=8, cg_iters=60, slq_steps=20)
    v_d, g_d = jax.jit(jax.value_and_grad(loss_fn))(m2)

    np.testing.assert_allclose(float(v_d), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_d.kern.lengthscales.unconstrained),
        np.asarray(g_ref.kern.lengthscales.unconstrained), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_d.likelihood.variance.unconstrained),
        np.asarray(g_ref.likelihood.variance.unconstrained), rtol=1e-5)


def test_grid_cholesky_2d_mesh_matches_dense():
    """2-D (rows x cols) block-cyclic Cholesky == jnp.linalg.cholesky."""
    from gpflow_slim_tpu import parallel

    rng2 = np.random.RandomState(1)
    for (Pr, Pc), N, bs in [((4, 2), 64, 8), ((2, 4), 128, 8)]:
        mesh = parallel.make_mesh({"rows": Pr, "cols": Pc})
        A = rng2.randn(N, N)
        K = A @ A.T + N * np.eye(N)
        L = parallel.grid_cholesky(jnp.asarray(K), mesh, ("rows", "cols"),
                                   block_size=bs)
        np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(K),
                                   atol=1e-10)


def test_2d_pipeline_gram_sharded_into_grid_cholesky():
    """The 2-D TP pipeline: Gram computed under GSPMD with a (rows, cols)
    output sharding (XLA partitions the distance matmul + map onto the
    grid), then factored by grid_cholesky."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpflow_slim_tpu import parallel

    mesh = parallel.make_mesh({"rows": 4, "cols": 2})
    rng2 = np.random.RandomState(2)
    N = 64
    X = jnp.asarray(rng2.uniform(0, 1, (N, 2)))
    kern = gfs.kernels.RBF(2, lengthscales=0.4)

    gram = jax.jit(
        lambda x: kern.K(x) + 0.5 * jnp.eye(N, dtype=x.dtype),
        out_shardings=NamedSharding(mesh, P("rows", "cols")),
    )
    K = gram(X)
    assert K.sharding.spec == P("rows", "cols")
    L = parallel.grid_cholesky(K, mesh, ("rows", "cols"), block_size=8)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(K)), atol=1e-10)
