"""Mean functions (ref:gpflowSlim/mean_functions.py).

``MeanFunction`` instances are Modules; ``__call__(X)`` is a pure function of
the pytree. ``+`` and ``*`` build ``Additive``/``Product`` combinations,
matching the reference's operator algebra.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .params import Module, Param

__all__ = [
    "MeanFunction",
    "Zero",
    "Constant",
    "Identity",
    "Linear",
    "Additive",
    "Product",
]


class MeanFunction(Module):
    def __call__(self, X):
        raise NotImplementedError

    def __add__(self, other):
        return Additive(self, other)

    def __mul__(self, other):
        return Product(self, other)


class Zero(MeanFunction):
    def __init__(self, output_dim=1):
        self.output_dim = int(output_dim)

    def __call__(self, X):
        return jnp.zeros((X.shape[0], self.output_dim), dtype=X.dtype)


class Constant(MeanFunction):
    def __init__(self, c=None, name="constant_mean"):
        c = np.zeros(1) if c is None else np.atleast_1d(np.asarray(c, dtype=np.float64))
        self.c = Param(c, name=f"{name}/c")

    def __call__(self, X):
        c = jnp.reshape(self.c.value, (1, -1))
        return jnp.tile(c, (X.shape[0], 1)).astype(X.dtype)


class Identity(MeanFunction):
    def __call__(self, X):
        return X


class Linear(MeanFunction):
    """``m(x) = A x + b``; A: (D, P), b: (P,)."""

    def __init__(self, A=None, b=None, name="linear_mean"):
        A = np.ones((1, 1)) if A is None else np.atleast_2d(np.asarray(A, dtype=np.float64))
        b = np.zeros(1) if b is None else np.atleast_1d(np.asarray(b, dtype=np.float64))
        self.A = Param(A, name=f"{name}/A")
        self.b = Param(b, name=f"{name}/b")

    def __call__(self, X):
        return X @ self.A.value + self.b.value


class Additive(MeanFunction):
    def __init__(self, first, second):
        self.add_1 = first
        self.add_2 = second

    def __call__(self, X):
        return self.add_1(X) + self.add_2(X)


class Product(MeanFunction):
    def __init__(self, first, second):
        self.prod_1 = first
        self.prod_2 = second

    def __call__(self, X):
        return self.prod_1(X) * self.prod_2(X)
