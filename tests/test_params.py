"""Param/Module pytree machinery (reference test_param.py role)."""

import jax
import jax.numpy as jnp
import numpy as np

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu import params, priors, transforms


def test_param_constrained_value():
    p = params.Param(2.5, transform=transforms.positive())
    np.testing.assert_allclose(float(p.value), 2.5, atol=1e-10)
    # unconstrained is softplus-inverse
    assert float(p.unconstrained) != 2.5


def test_param_prior_logp_includes_jacobian():
    t = transforms.Exp(lower=0.0)
    p = params.Param(2.0, transform=t, prior=priors.Gaussian(0.0, 1.0))
    u = float(p.unconstrained)  # log 2
    expected = float(
        priors.Gaussian(0.0, 1.0).logp(jnp.exp(u)) + u
    )  # jacobian of exp is exp(u) -> log jac = u
    np.testing.assert_allclose(float(p.prior_logp()), expected, atol=1e-10)


def test_param_no_prior_logp_zero():
    p = params.Param(1.0, transform=transforms.positive())
    assert float(p.prior_logp()) == 0.0


def test_module_pytree_roundtrip_and_static_fields():
    k = gfs.kernels.RBF(2, active_dims=[0, 1], name="foo")
    leaves, treedef = jax.tree_util.tree_flatten(k)
    k2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert k2.name == "foo"
    assert k2.active_dims == (0, 1)
    assert k2.input_dim == 2


def test_grad_flows_to_trainable_only():
    X = np.random.RandomState(0).randn(10, 1)
    Y = np.random.RandomState(1).randn(10, 1)
    k = gfs.kernels.RBF(1)
    m = gfs.models.GPR(X, Y, kern=k)
    grads = jax.grad(lambda mm: mm.objective())(m)
    mask = params.trainable_leaf_mask(m)
    leaves = jax.tree_util.tree_leaves(grads)
    assert len(mask) == len(leaves)
    # trainable leaves get nonzero grads; data leaves are marked False
    n_trainable = sum(mask)
    assert n_trainable == 3  # kernel var, kernel ls, noise var


def test_non_trainable_param_masked():
    k = gfs.kernels.RBF(1)
    k.variance = params.Param(1.0, transform=transforms.positive(),
                              trainable=False, name="variance")
    X = np.random.RandomState(0).randn(10, 1)
    Y = np.random.RandomState(1).randn(10, 1)
    m = gfs.models.GPR(X, Y, kern=k)
    before = float(np.squeeze(m.kern.variance.value))
    m2, _ = gfs.training.fit(m, num_steps=20, learning_rate=0.1)
    after = float(np.squeeze(m2.kern.variance.value))
    assert before == after  # frozen
    # but lengthscales moved
    assert float(np.squeeze(m2.kern.lengthscales.value)) != float(
        np.squeeze(m.kern.lengthscales.value)
    )


def test_jit_cache_respects_static_fields():
    X = np.random.RandomState(0).randn(5, 1)
    k1 = gfs.kernels.RBF(1)
    k2 = gfs.kernels.Matern32(1)
    calls = []

    @jax.jit
    def f(kern):
        calls.append(1)
        return jnp.sum(kern.K(X))

    f(k1)
    f(k1)
    assert len(calls) == 1  # same structure -> cached
    f(k2)
    assert len(calls) == 2  # different class -> retrace


def test_pack_unpack_trainable_vector():
    k = gfs.kernels.RBF(2, ARD=True)
    X = np.random.RandomState(0).randn(8, 2)
    Y = np.random.RandomState(1).randn(8, 1)
    m = gfs.models.GPR(X, Y, kern=k)
    v, unpack = params.pack_trainable(m)
    assert v.shape == (4,)  # ls(2) + var + noise
    m2 = unpack(v + 0.0)
    np.testing.assert_allclose(float(m.objective()), float(m2.objective()))


def test_parameters_listing():
    k = gfs.kernels.RBF(1) + gfs.kernels.Matern32(1)
    names = [n for n, _ in params.parameters(k)]
    assert len(names) == 4
    assert any("kernels" in n for n in names)
