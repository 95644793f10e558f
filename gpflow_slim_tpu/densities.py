"""Scalar log-densities + Cholesky-parameterized MVN (ref:gpflowSlim/densities.py).

Pure jnp functions; elementwise log-pdfs broadcast, and
``multivariate_normal`` is the workhorse of exact GPR / GPMC: the MVN logpdf
of (possibly multi-column) observations given a precomputed Cholesky factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular
from jax.scipy.special import betaln, gammaln

__all__ = [
    "gaussian",
    "lognormal",
    "bernoulli",
    "poisson",
    "exponential",
    "gamma",
    "student_t",
    "beta",
    "laplace",
    "multivariate_normal",
]

_HALF_LOG_2PI = 0.5 * jnp.log(2.0 * jnp.pi)


def gaussian(x, mu, var):
    return -0.5 * jnp.log(2.0 * jnp.pi * var) - 0.5 * jnp.square(x - mu) / var


def lognormal(x, mu, var):
    lnx = jnp.log(x)
    return gaussian(lnx, mu, var) - lnx


def bernoulli(p, y):
    return jnp.log(jnp.where(jnp.equal(y, 1), p, 1.0 - p))


def poisson(lamb, y):
    return y * jnp.log(lamb) - lamb - gammaln(y + 1.0)


def exponential(lamb, y):
    """Rate-``1/lamb`` exponential: reference parameterizes by mean ``lamb``."""
    return -y / lamb - jnp.log(lamb)


def gamma(shape, scale, x):
    return (
        -shape * jnp.log(scale)
        - gammaln(shape)
        + (shape - 1.0) * jnp.log(x)
        - x / scale
    )


def student_t(x, mean, scale, df):
    df = jnp.asarray(df, dtype=jnp.result_type(x))
    const = (
        gammaln((df + 1.0) * 0.5)
        - gammaln(df * 0.5)
        - 0.5 * (jnp.log(jnp.square(scale)) + jnp.log(df) + jnp.log(jnp.pi))
    )
    return const - 0.5 * (df + 1.0) * jnp.log1p(
        (1.0 / df) * jnp.square((x - mean) / scale)
    )


def beta(alpha, bet, y):
    return (
        (alpha - 1.0) * jnp.log(y)
        + (bet - 1.0) * jnp.log1p(-y)
        - betaln(alpha, bet)
    )


def laplace(mu, sigma, y):
    return -jnp.abs(mu - y) / sigma - jnp.log(2.0 * sigma)


def multivariate_normal(x, mu, L):
    """Total MVN logpdf of column(s) ``x`` given mean ``mu`` and Cholesky ``L``.

    x, mu: (N,) or (N, P); L: (N, N) lower. Returns the scalar sum over the P
    columns of ``-N/2 log 2π − Σ log diag L − ½‖L⁻¹(x−μ)‖²`` (SURVEY App. A).
    """
    x = jnp.asarray(x)
    mu = jnp.asarray(mu)
    d = x - mu
    if d.ndim == 1:
        d = d[:, None]
    alpha = solve_triangular(L, d, lower=True)
    num_col = d.shape[1]
    num_dims = d.shape[0]
    ret = -0.5 * num_dims * num_col * jnp.log(2.0 * jnp.pi)
    ret -= num_col * jnp.sum(jnp.log(jnp.diagonal(L)))
    ret -= 0.5 * jnp.sum(jnp.square(alpha))
    return ret
