"""GP conditionals (ref:gpflowSlim/conditionals.py).

``base_conditional`` is THE core predictive-math routine (SURVEY App. A):
given Kmn, Kmm, Knn and latent values/statistics at the M points, produce the
predictive mean and (co)variance at the N points, with optional variational
``q_sqrt`` covariance terms and whitened representation.

Shapes follow the reference convention:
  Kmn (M, N); Kmm (M, M); Knn (N, N) if full_cov else (N,);
  f (M, P); q_sqrt (M, P) diag or (P, M, M) lower-tri.
Returns fmean (N, P) and fvar (N, P) (diag) or (P, N, N) (full).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cholesky, solve_triangular

from . import config

__all__ = ["base_conditional", "conditional", "feature_conditional"]


def base_conditional(Kmn, Kmm, Knn, f, *, full_cov=False, q_sqrt=None, white=False):
    num_func = f.shape[1]  # P
    Lm = cholesky(Kmm, lower=True)

    A = solve_triangular(Lm, Kmn, lower=True)  # (M, N)

    if full_cov:
        fvar = Knn - A.T @ A  # (N, N)
        fvar = jnp.tile(fvar[None, :, :], (num_func, 1, 1))  # (P, N, N)
    else:
        fvar = Knn - jnp.sum(jnp.square(A), axis=0)  # (N,)
        fvar = jnp.tile(fvar[None, :], (num_func, 1))  # (P, N)

    if not white:
        A = solve_triangular(Lm.T, A, lower=False)  # Kmm⁻¹-weighted

    fmean = A.T @ f  # (N, P)

    if q_sqrt is not None:
        if q_sqrt.ndim == 2:
            # diagonal q_sqrt: (M, P) -> LTA (P, M, N)
            LTA = A[None, :, :] * q_sqrt.T[:, :, None]
        elif q_sqrt.ndim == 3:
            L = jnp.tril(q_sqrt)  # (P, M, M)
            LTA = jax.vmap(lambda Lp: Lp.T @ A)(L)  # (P, M, N)
        else:
            raise ValueError(f"bad q_sqrt rank: {q_sqrt.ndim}")
        if full_cov:
            fvar = fvar + jnp.einsum("pmn,pmk->pnk", LTA, LTA)
        else:
            fvar = fvar + jnp.sum(jnp.square(LTA), axis=1)  # (P, N)

    if not full_cov:
        fvar = fvar.T  # (N, P)

    return fmean, fvar


def conditional(Xnew, X, kern, f, *, full_cov=False, q_sqrt=None, white=False):
    """Predictive q(f*) given (variational) values f at inputs X."""
    jitter = config.default_jitter()
    num_data = X.shape[0]
    Kmm = kern.K(X) + jitter * jnp.eye(num_data, dtype=Xnew.dtype)
    Kmn = kern.K(X, Xnew)
    Knn = kern.K(Xnew) if full_cov else kern.Kdiag(Xnew)
    return base_conditional(
        Kmn, Kmm, Knn, f, full_cov=full_cov, q_sqrt=q_sqrt, white=white
    )


def feature_conditional(Xnew, feat, kern, f, *, full_cov=False, q_sqrt=None,
                        white=False):
    """Conditional through an inducing feature (dispatching Kuu/Kuf)."""
    from . import features as features_mod

    jitter = config.default_jitter()
    Kmm = features_mod.Kuu(feat, kern, jitter=jitter)
    Kmn = features_mod.Kuf(feat, kern, Xnew)
    Knn = kern.K(Xnew) if full_cov else kern.Kdiag(Xnew)
    return base_conditional(
        Kmn, Kmm, Knn, f, full_cov=full_cov, q_sqrt=q_sqrt, white=white
    )
