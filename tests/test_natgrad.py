"""Natural-gradient tests.

Key oracle: for a CONJUGATE (Gaussian) SVGP with fixed hyperparameters, one
natural-gradient step with γ=1 on the full data jumps q(u) exactly to the
optimal variational distribution — the ELBO equals its maximum after a
single step (Salimbeni et al. 2018, §4). With Z=X that maximum is the GPR
log marginal likelihood.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu.training import natgrad


def make_problem(N=24, q_diag=False, whiten=True):
    rng = np.random.RandomState(0)
    X = rng.uniform(0, 1, (N, 1))
    Y = np.sin(6 * X) + 0.1 * rng.randn(N, 1)
    m = gfs.models.SVGP(
        X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.4),
        likelihood=gfs.likelihoods.Gaussian(variance=0.05),
        Z=X.copy(), q_diag=q_diag, whiten=whiten,
    )
    gpr = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.4))
    gpr.likelihood.variance = gfs.params.Param(
        0.05, transform=gfs.transforms.positive(), name="noise")
    return m, gpr


@pytest.mark.parametrize("whiten", [True, False])
def test_one_natgrad_step_solves_conjugate_svgp(whiten):
    m, gpr = make_problem(whiten=whiten)
    lml = float(gpr.build_likelihood())
    loss = lambda mm: -mm.build_likelihood()
    before = -float(loss(m))
    m1 = natgrad.natgrad_step(m, loss, gamma=1.0)
    after = -float(loss(m1))
    assert after > before
    # γ=1 exact jump to the optimum (conjugate case); optimum == GPR lml
    # up to jitter-level differences at Z=X
    assert abs(after - lml) < 1e-3
    # a second step must not move (already at the optimum)
    m2 = natgrad.natgrad_step(m1, loss, gamma=1.0)
    assert abs(-float(loss(m2)) - after) < 1e-6


def test_natgrad_beats_adam_iterations():
    m, gpr = make_problem()
    lml = float(gpr.build_likelihood())
    # 30 natgrad steps with small gamma converge far better than 30 Adam steps
    loss = lambda mm: -mm.build_likelihood()
    mm = m
    for _ in range(5):
        mm = natgrad.natgrad_step(mm, loss, gamma=0.5)
    elbo_ng = -float(loss(mm))
    m_adam, _ = gfs.training.fit(m, num_steps=5, learning_rate=0.05)
    elbo_adam = float(m_adam.build_likelihood())
    assert elbo_ng > elbo_adam


def test_fit_svgp_natgrad_end_to_end():
    rng = np.random.RandomState(1)
    N = 200
    X = rng.uniform(0, 1, (N, 1))
    Y = (np.sin(8 * X) > 0).astype(float)
    m = gfs.models.SVGP(
        X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3),
        likelihood=gfs.likelihoods.Bernoulli(),
        Z=np.linspace(0, 1, 12)[:, None],
    )
    before = float(m.objective())
    m2, losses = natgrad.fit_svgp_natgrad(
        m, num_steps=100, key=jax.random.PRNGKey(0), gamma=0.1,
        learning_rate=0.05, batch_size=64,
    )
    after = float(m2.objective())
    assert after < before - 10.0
    assert np.isfinite(np.asarray(losses)).all()
    # classification accuracy sanity
    p, _ = m2.predict_y(X)
    acc = float(np.mean((np.asarray(p) > 0.5) == (Y > 0.5)))
    assert acc > 0.9


def test_natgrad_qdiag():
    m, gpr = make_problem(q_diag=True)
    loss = lambda mm: -mm.build_likelihood()
    before = -float(loss(m))
    m1 = natgrad.natgrad_step(m, loss, gamma=0.5)
    m1 = natgrad.natgrad_step(m1, loss, gamma=0.5)
    after = -float(loss(m1))
    assert after > before
