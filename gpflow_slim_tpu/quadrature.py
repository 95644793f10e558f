"""Gauss–Hermite quadrature (ref:gpflowSlim/quadrature.py).

Nodes/weights are host-side numpy constants closed over at trace time (they
become XLA constants — no per-step host transfer). ``ndiagquad`` computes
E[g(f)] under diagonal Gaussians for arbitrary (lists of) functions, the
fallback used by every non-analytic likelihood method.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterable

import jax.numpy as jnp
import numpy as np

from . import config

__all__ = ["hermgauss", "mvhermgauss", "ndiagquad"]


def hermgauss(n: int):
    """1-D Gauss–Hermite nodes/weights as numpy float64."""
    x, w = np.polynomial.hermite.hermgauss(n)
    return x, w


def mvhermgauss(H: int, D: int):
    """Tensor-product Gauss–Hermite grid over D dimensions.

    Returns locations (H^D, D) and weights (H^D,).
    """
    gh_x, gh_w = hermgauss(H)
    x = np.array(list(itertools.product(*(gh_x,) * D)))
    w = np.prod(np.array(list(itertools.product(*(gh_w,) * D))), 1)
    return x, w


def ndiagquad(funcs, H: int, Fmu, Fvar, logspace: bool = False, **Ys):
    """Gauss–Hermite expectation of ``funcs`` under diagonal Gaussians.

    E[g(f, **Ys)] ≈ Σᵢ wᵢ/√π · g(μ + √2·v·xᵢ) per element of Fmu/Fvar
    (SURVEY App. A). ``Fmu``/``Fvar`` may be arrays or tuples of arrays (for
    multi-latent likelihoods); ``Ys`` are broadcast against the quadrature
    axis. With ``logspace=True`` computes log E[exp(g)] via logsumexp.
    """
    if isinstance(Fmu, (tuple, list)):
        Din = len(Fmu)
        shape = jnp.shape(Fmu[0])
        Fmu = jnp.stack([jnp.reshape(f, (-1,)) for f in Fmu], axis=-1)  # (N, Din)
        Fvar = jnp.stack([jnp.reshape(f, (-1,)) for f in Fvar], axis=-1)
        multi = True
    else:
        Din = 1
        shape = jnp.shape(Fmu)
        Fmu = jnp.reshape(Fmu, (-1, 1))
        Fvar = jnp.reshape(Fvar, (-1, 1))
        multi = False

    xn, wn = mvhermgauss(H, Din)
    dtype = Fmu.dtype
    xn = jnp.asarray(xn, dtype=dtype)  # (H^D, Din)
    wn = jnp.asarray(wn, dtype=dtype) / np.pi ** (Din / 2.0)  # normalized

    # evaluation points: (H^D, N, Din)
    Xall = Fmu[None, :, :] + jnp.sqrt(2.0 * Fvar)[None, :, :] * xn[:, None, :]

    Ys_flat = {
        name: jnp.reshape(jnp.asarray(Y), (1, -1)) for name, Y in Ys.items()
    }

    def eval_func(f):
        if multi:
            args = [Xall[:, :, d] for d in range(Din)]
        else:
            args = [Xall[:, :, 0]]
        feval = f(*args, **Ys_flat)  # (H^D, N)
        if logspace:
            log_w = jnp.log(wn)[:, None]
            result = logsumexp_ax0(feval + log_w)
        else:
            result = wn @ feval
        return jnp.reshape(result, shape)

    if isinstance(funcs, Iterable) and not callable(funcs):
        return [eval_func(f) for f in funcs]
    return eval_func(funcs)


def logsumexp_ax0(a):
    from jax.scipy.special import logsumexp

    return logsumexp(a, axis=0)
