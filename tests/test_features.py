"""Inducing-feature tests: InducingPoints dispatch + Multiscale closed forms."""

import jax.numpy as jnp
import numpy as np
import pytest

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu import features

rng = np.random.RandomState(0)


def test_inducing_points_kuu_kuf():
    Z = rng.randn(6, 2)
    X = rng.randn(9, 2)
    k = gfs.kernels.RBF(2, variance=1.3, lengthscales=0.7)
    feat = features.InducingPoints(Z)
    assert len(feat) == 6
    Kuu = np.asarray(features.Kuu(feat, k, jitter=1e-6))
    np.testing.assert_allclose(
        Kuu, np.asarray(k.K(jnp.asarray(Z))) + 1e-6 * np.eye(6), atol=1e-12
    )
    Kuf = np.asarray(features.Kuf(feat, k, jnp.asarray(X)))
    np.testing.assert_allclose(
        Kuf, np.asarray(k.K(jnp.asarray(Z), jnp.asarray(X))), atol=1e-12
    )


def test_multiscale_zero_scales_reduces_to_inducing_points():
    # scales → 0 recovers plain inducing points for the RBF kernel
    Z = rng.randn(5, 2)
    X = rng.randn(7, 2)
    k = gfs.kernels.RBF(2, variance=0.9, lengthscales=0.8)
    # note: the positive transform's lower bound is 1e-6, so scales below
    # that are unrepresentable (reference-lineage gotcha) — use 1e-4
    ms = features.Multiscale(Z, scales=np.full_like(Z, 1e-4))
    ip = features.InducingPoints(Z)
    np.testing.assert_allclose(
        np.asarray(features.Kuf(ms, k, jnp.asarray(X))),
        np.asarray(features.Kuf(ip, k, jnp.asarray(X))),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(features.Kuu(ms, k, jitter=0.0)),
        np.asarray(features.Kuu(ip, k, jitter=0.0)),
        atol=1e-3,
    )


def test_multiscale_kuf_matches_integral_mc():
    # Kuf for Multiscale is E_{u~N(z, diag(s²))}-style smoothed RBF; verify
    # against the closed form computed directly in numpy
    Z = rng.randn(4, 1)
    S = 0.3 + 0.2 * rng.rand(4, 1)
    X = rng.randn(6, 1)
    var, ls = 1.2, 0.5
    k = gfs.kernels.RBF(1, variance=var, lengthscales=ls)
    ms = features.Multiscale(Z, scales=S)
    got = np.asarray(features.Kuf(ms, k, jnp.asarray(X)))
    idl = ls + S  # (4, 1)
    d = ((X[None, :, 0] - Z[:, None, 0]) / idl) ** 2
    expected = var * np.exp(-0.5 * d) * (ls / idl)
    np.testing.assert_allclose(got, expected, atol=1e-8)


def test_multiscale_in_sgpr_trains():
    X = rng.uniform(0, 1, (60, 1))
    Y = np.sin(6 * X) + 0.1 * rng.randn(60, 1)
    ms = features.Multiscale(np.linspace(0, 1, 8)[:, None],
                             scales=np.full((8, 1), 0.1))
    m = gfs.models.SGPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3),
                        feat=ms)
    before = float(m.objective())
    m2, _ = gfs.training.fit(m, num_steps=100, learning_rate=0.05)
    assert float(m2.objective()) < before
    # scales are trainable Params and moved
    assert (
        np.abs(np.asarray(m2.feature.scales.value)
               - np.asarray(m.feature.scales.value)).max() > 1e-4
    )


def test_multiscale_requires_rbf():
    ms = features.Multiscale(rng.randn(3, 1))
    with pytest.raises(NotImplementedError):
        features.Kuu(ms, gfs.kernels.Matern32(1))


def test_inducingpoint_wrapper_errors():
    with pytest.raises(ValueError):
        features.inducingpoint_wrapper(None, None)
    with pytest.raises(ValueError):
        features.inducingpoint_wrapper(
            features.InducingPoints(np.zeros((2, 1))), np.zeros((2, 1))
        )
