"""Neural Kernel Network tests: PSD preservation, algebra, end-to-end fit."""

import jax
import jax.numpy as jnp
import numpy as np

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu.kernels_nkn import NKN, NKNLinear, NKNProduct

rng = np.random.RandomState(0)


def make_nkn(input_dim=1):
    prims = [
        gfs.kernels.RBF(input_dim, lengthscales=0.3, name="p0"),
        gfs.kernels.Periodic(input_dim, period=0.5, name="p1"),
        gfs.kernels.Linear(input_dim, name="p2"),
        gfs.kernels.Matern32(input_dim, lengthscales=0.8, name="p3"),
    ]
    layers = [
        NKNLinear(4, 4, name="l0"),
        NKNProduct(4, 2, name="l1"),
        NKNLinear(2, 1, name="l2"),
    ]
    return NKN(input_dim, prims, layers)


def test_nkn_psd_and_symmetric():
    k = make_nkn()
    X = rng.randn(20, 1)
    G = np.asarray(k.K(jnp.asarray(X)))
    np.testing.assert_allclose(G, G.T, atol=1e-10)
    assert np.linalg.eigvalsh(G).min() > -1e-8


def test_nkn_kdiag_consistent():
    k = make_nkn()
    X = rng.randn(15, 1)
    G = np.asarray(k.K(jnp.asarray(X)))
    d = np.asarray(k.Kdiag(jnp.asarray(X)))
    np.testing.assert_allclose(np.diag(G), d, atol=1e-5)


def test_nkn_manual_composition():
    # single linear layer with known weights = weighted sum of primitives
    prims = [gfs.kernels.RBF(1), gfs.kernels.Linear(1)]
    lin = NKNLinear(2, 1, weights=np.array([[0.5, 2.0]]))
    k = NKN(1, prims, [lin])
    X = rng.randn(10, 1)
    got = np.asarray(k.K(jnp.asarray(X)))
    expected = 0.5 * np.asarray(prims[0].K(jnp.asarray(X))) + 2.0 * np.asarray(
        prims[1].K(jnp.asarray(X))
    )
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_nkn_trains_on_composite_signal():
    X = np.linspace(0, 2, 150)[:, None]
    # trend + periodicity: the structure NKN is designed to discover
    Y = 0.5 * X + np.sin(8 * X) * 0.5 + 0.05 * rng.randn(150, 1)
    m = gfs.models.GPR(X, Y, kern=make_nkn())
    before = float(m.objective())
    m2, _ = gfs.training.fit(m, num_steps=300, learning_rate=0.03)
    after = float(m2.objective())
    assert after < before - 10
    mu, _ = m2.predict_f(X)
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - Y) ** 2)))
    assert rmse < 0.1


def test_nkn_grads_reach_all_layers():
    k = make_nkn()
    X, Y = rng.randn(20, 1), rng.randn(20, 1)
    m = gfs.models.GPR(X, Y, kern=k)
    g = jax.grad(lambda mm: mm.objective())(m)
    gw0 = np.asarray(g.kern.layers[0].weights.unconstrained)
    gw2 = np.asarray(g.kern.layers[2].weights.unconstrained)
    gprim = np.asarray(g.kern.primitives[0].lengthscales.unconstrained)
    assert np.abs(gw0).max() > 0 and np.abs(gw2).max() > 0
    assert np.abs(gprim).max() > 0
