"""Full-data non-conjugate variational GP (ref:gpflowSlim/models/vgp.py).

Whitened representation: q(v) = N(q_mu, q_sqrt q_sqrtᵀ) with f = L v + m(X),
L = chol(K(X)+jitter). ELBO = Σ variational_expectations − KL[q(v)‖N(0,I)].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..conditionals import conditional
from ..kullback_leiblers import gauss_kl
from ..ops import linalg
from ..params import Param
from ..transforms import LowerTriangular
from .model import GPModel


class VGP(GPModel):
    def __init__(self, X, Y, kern, likelihood, mean_function=None,
                 num_latent=None, name="vgp"):
        super().__init__(X, Y, kern, likelihood, mean_function,
                         num_latent=num_latent, name=name)
        N = self.num_data = int(X.shape[0])
        P = self.num_latent
        self.q_mu = Param(np.zeros((N, P)), name=f"{name}/q_mu")
        init = np.tile(np.eye(N)[None], (P, 1, 1))
        self.q_sqrt = Param(
            init, transform=LowerTriangular(N, num_matrices=P),
            name=f"{name}/q_sqrt",
        )

    def build_likelihood(self):
        N = self.num_data
        kl = gauss_kl(self.q_mu.value, self.q_sqrt.value, None)

        K = self.kern.K(self.X) + jnp.eye(N, dtype=self.X.dtype) * config.default_jitter()
        L = linalg.cholesky(K)
        fmean = L @ self.q_mu.value + self.mean_function(self.X)  # (N, P)

        q_sqrt = jnp.tril(self.q_sqrt.value)  # (P, N, N)
        LSq = jax.vmap(lambda S: L @ S)(q_sqrt)  # (P, N, N)
        fvar = jnp.sum(jnp.square(LSq), axis=2).T  # (N, P)

        var_exp = self.likelihood.variational_expectations(fmean, fvar, self.Y)
        return jnp.sum(var_exp) - kl

    def build_predict(self, Xnew, full_cov=False):
        mu, var = conditional(
            Xnew, self.X, self.kern, self.q_mu.value,
            full_cov=full_cov, q_sqrt=self.q_sqrt.value, white=True,
        )
        return mu + self.mean_function(Xnew), var
