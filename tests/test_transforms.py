"""Transform round-trips and log-Jacobians vs finite differences (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpflow_slim_tpu import transforms


ELEMENTWISE = [
    transforms.Identity(),
    transforms.Exp(),
    transforms.Log1pe(),
    transforms.Logistic(-2.0, 3.0),
    transforms.Chain(transforms.Exp(lower=0.0), transforms.Identity()),
]


@pytest.mark.parametrize("t", ELEMENTWISE, ids=lambda t: type(t).__name__)
def test_forward_backward_roundtrip(t):
    x = np.random.RandomState(0).randn(10)
    y = np.asarray(t.forward(jnp.asarray(x)))
    x2 = np.asarray(t.backward(jnp.asarray(y)))
    np.testing.assert_allclose(x, x2, atol=1e-8)


@pytest.mark.parametrize("t", ELEMENTWISE, ids=lambda t: type(t).__name__)
def test_log_jacobian_matches_autodiff(t):
    x = jnp.asarray(np.random.RandomState(1).randn(6))
    # sum of log |d forward_i / dx_i| via per-element jacobian
    grads = jax.vmap(jax.grad(lambda xi: t.forward(xi)))(x)
    expected = jnp.sum(jnp.log(jnp.abs(grads)))
    actual = t.log_jacobian(x)
    np.testing.assert_allclose(float(actual), float(expected), atol=1e-8)


def test_log1pe_positive_and_lower_bound():
    t = transforms.Log1pe(lower=1e-6)
    x = jnp.asarray(np.linspace(-20, 20, 50))
    y = np.asarray(t.forward(x))
    assert np.all(y > 1e-6 - 1e-15)


def test_lower_triangular_packing():
    t = transforms.LowerTriangular(3, num_matrices=2)
    x = jnp.arange(1.0, 13.0)  # 2 * 6 entries
    Y = np.asarray(t.forward(x))
    assert Y.shape == (2, 3, 3)
    assert np.all(np.triu(Y[0], 1) == 0)
    np.testing.assert_allclose(Y[0][np.tril_indices(3)], [1, 2, 3, 4, 5, 6])
    x2 = np.asarray(t.backward(jnp.asarray(Y)))
    np.testing.assert_allclose(np.asarray(x), x2)


def test_lower_triangular_squeeze():
    t = transforms.LowerTriangular(2, squeeze=True)
    Y = np.asarray(t.forward(jnp.asarray([1.0, 2.0, 3.0])))
    assert Y.shape == (2, 2)
    np.testing.assert_allclose(Y, [[1.0, 0.0], [2.0, 3.0]])
