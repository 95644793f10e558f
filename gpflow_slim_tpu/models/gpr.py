"""Exact Gaussian-process regression (ref:gpflowSlim/models/gpr.py).

Conjugate model: log marginal likelihood via one Cholesky of
``K(X) + σ² I`` and the MVN logpdf (SURVEY App. A); predictions via
triangular solves against the stored training data. The Cholesky and solves
route through ``ops.linalg`` so the Pallas blocked kernels can be swapped in
behind a config flag.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..likelihoods import Gaussian
from ..ops import linalg
from .model import GPModel


class GPR(GPModel):
    def __init__(self, X, Y, kern, mean_function=None, name="gpr"):
        likelihood = Gaussian(name=f"{name}/likelihood")
        super().__init__(X, Y, kern, likelihood, mean_function, name=name)

    def _K_chol(self):
        # K_lower: the factorization (symmetrize_input=False) reads only
        # the lower triangle, so stationary kernels skip the elementwise
        # map on the strictly-upper tile grid (ops/pallas_gram.py)
        N = self.X.shape[0]
        K = self.kern.K_lower(self.X) + jnp.squeeze(
            self.likelihood.variance.value
        ) * jnp.eye(N, dtype=self.X.dtype)
        return linalg.cholesky(K)

    def build_likelihood(self):
        """log p(Y | θ) = MVN(Y; m(X), K + σ²I), summed over output columns.

        Routed through ``ops.linalg.gpr_chol_terms`` — on the Pallas
        route the whole pipeline is the one-pass gram+noise+pad operand
        kernel feeding the fused potrf+potrs factorization, with no
        other N²-scale passes (same math as
        ``densities.multivariate_normal``; SURVEY App. A).
        """
        N = self.X.shape[0]
        d = self.Y - self.mean_function(self.X)
        noise = jnp.squeeze(self.likelihood.variance.value)
        half_logdet, quad = linalg.gpr_chol_terms(
            self.kern, self.X, noise, d)
        num_col = d.shape[1] if d.ndim > 1 else 1
        return (
            -0.5 * N * num_col * jnp.log(2.0 * jnp.pi)
            - num_col * half_logdet
            - 0.5 * quad
        )

    def posterior(self):
        """Precompute (L, α) once for O(N·N*) serving predictions."""
        from .posterior import GPRPosterior

        L = self._K_chol()
        err = self.Y - self.mean_function(self.X)
        alpha = linalg.solve_upper(L.T, linalg.solve_lower(L, err))
        return GPRPosterior(self.kern, self.likelihood, self.mean_function,
                            self.X, L, alpha, self.num_latent)

    def build_predict(self, Xnew, full_cov=False):
        Kx = self.kern.K(self.X, Xnew)  # (N, N*)
        L = self._K_chol()
        A = linalg.solve_lower(L, Kx)  # (N, N*)
        V = linalg.solve_lower(L, self.Y - self.mean_function(self.X))  # (N, P)
        fmean = A.T @ V + self.mean_function(Xnew)
        if full_cov:
            fvar = self.kern.K(Xnew) - A.T @ A
            fvar = jnp.tile(fvar[None, :, :], (self.num_latent, 1, 1))  # (P,N*,N*)
        else:
            fvar = self.kern.Kdiag(Xnew) - jnp.sum(jnp.square(A), axis=0)
            fvar = jnp.tile(fvar[:, None], (1, self.num_latent))  # (N*, P)
        return fmean, fvar
