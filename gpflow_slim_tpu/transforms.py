"""Bijective constraint transforms (ref:gpflowSlim/transforms.py).

Each transform maps an unconstrained vector ``x`` to the constrained value
``y = forward(x)`` and back, plus the log-Jacobian ``log|dy/dx|`` summed over
elements — required so priors placed on constrained values induce correct
densities on the unconstrained coordinates used by optimizers and MCMC.

Conventions matched to the reference lineage (parity-critical, SURVEY App. A):
  * ``Log1pe`` (the default ``positive``): ``forward(x) = softplus(x) + lower``
    with ``lower = 1e-6``; ``log_jacobian = sum(-softplus(-x))``.
  * ``Exp``: ``forward(x) = exp(x) + lower``; ``log_jacobian = sum(x)``.
  * ``Logistic(a, b)``: affine-sigmoid into (a, b).
  * ``LowerTriangular``: packs a flat vector into (num_matrices, N, N) lower
    triangles (identity on the packed coordinates; log-Jacobian 0) — used by
    SVGP's ``q_sqrt``.

All transforms are frozen dataclasses: hashable static pytree metadata, and
pure-jnp ``forward``/``backward`` usable inside any jit/grad/vmap context.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Transform",
    "Identity",
    "Exp",
    "Log1pe",
    "Logistic",
    "Chain",
    "LowerTriangular",
    "positive",
]


@dataclasses.dataclass(frozen=True)
class Transform:
    def forward(self, x):
        raise NotImplementedError

    def backward(self, y):
        raise NotImplementedError

    def log_jacobian(self, x):
        """log|d forward / dx| at unconstrained x, summed over elements."""
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Transform):
    def forward(self, x):
        return x

    def backward(self, y):
        return y

    def log_jacobian(self, x):
        return jnp.zeros((), dtype=jnp.result_type(x))


@dataclasses.dataclass(frozen=True)
class Exp(Transform):
    lower: float = 1e-6

    def forward(self, x):
        return jnp.exp(x) + self.lower

    def backward(self, y):
        return jnp.log(y - self.lower)

    def log_jacobian(self, x):
        return jnp.sum(x)


@dataclasses.dataclass(frozen=True)
class Log1pe(Transform):
    """Softplus-with-shift, the reference's default positive transform."""

    lower: float = 1e-6

    def forward(self, x):
        return jax.nn.softplus(x) + self.lower

    def backward(self, y):
        # stable inverse-softplus: log(e^z - 1) = z + log1p(-e^{-z})
        z = jnp.asarray(y) - self.lower
        return z + jnp.log(-jnp.expm1(-z))

    def log_jacobian(self, x):
        return -jnp.sum(jax.nn.softplus(-x))


@dataclasses.dataclass(frozen=True)
class Logistic(Transform):
    a: float = 0.0
    b: float = 1.0

    def forward(self, x):
        return self.a + (self.b - self.a) * jax.nn.sigmoid(x)

    def backward(self, y):
        p = (jnp.asarray(y) - self.a) / (self.b - self.a)
        return jnp.log(p) - jnp.log1p(-p)

    def log_jacobian(self, x):
        x = jnp.asarray(x)
        n = x.size
        return jnp.sum(
            -jax.nn.softplus(-x) - jax.nn.softplus(x)
        ) + n * jnp.log(self.b - self.a)


@dataclasses.dataclass(frozen=True)
class Chain(Transform):
    """``forward = outer.forward(inner.forward(x))``."""

    outer: Transform
    inner: Transform

    def forward(self, x):
        return self.outer.forward(self.inner.forward(x))

    def backward(self, y):
        return self.inner.backward(self.outer.backward(y))

    def log_jacobian(self, x):
        mid = self.inner.forward(x)
        return self.inner.log_jacobian(x) + self.outer.log_jacobian(mid)


def _tri_indices(n: int):
    return np.tril_indices(n)


@dataclasses.dataclass(frozen=True)
class LowerTriangular(Transform):
    """Pack flat vector(s) into lower-triangular matrices.

    ``forward`` maps a vector of length ``num_matrices * n(n+1)/2`` to an
    array ``(num_matrices, n, n)`` (or ``(n, n)`` when ``squeeze``) with the
    vector filling the lower triangle row-wise. The map is a linear embedding
    with unit Jacobian on its coordinates.
    """

    n: int
    num_matrices: int = 1
    squeeze: bool = False

    def forward(self, x):
        x = jnp.asarray(x)
        m = self.n * (self.n + 1) // 2
        xs = jnp.reshape(x, (self.num_matrices, m))
        rows, cols = _tri_indices(self.n)
        out = jnp.zeros((self.num_matrices, self.n, self.n), dtype=x.dtype)
        out = out.at[:, rows, cols].set(xs)
        if self.squeeze and self.num_matrices == 1:
            out = out[0]
        return out

    def backward(self, y):
        y = jnp.asarray(y)
        if y.ndim == 2:
            y = y[None]
        rows, cols = _tri_indices(self.n)
        return jnp.ravel(y[:, rows, cols])

    def log_jacobian(self, x):
        return jnp.zeros((), dtype=jnp.result_type(x))


def positive(lower: float | None = None) -> Transform:
    """The default positivity transform (reference ``transforms.positive``)."""
    from . import config

    if lower is None:
        lower = config.settings().positive_minimum
    return Log1pe(lower=lower)
