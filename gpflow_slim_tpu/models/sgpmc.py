"""Sparse MCMC GP (ref:gpflowSlim/models/sgpmc.py; Hensman et al. 2015).

Whitened latents V at M inducing points with N(0,I) prior; the data term is
the conditional-mean propagation Σ E_{q(f|v)}[log p(y|f)] (variational
expectations through the white conditional).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config, features as features_mod, priors
from ..conditionals import base_conditional
from ..params import Param
from .model import GPModel


class SGPMC(GPModel):
    def __init__(self, X, Y, kern, likelihood, feat=None, Z=None,
                 mean_function=None, num_latent=None, name="sgpmc"):
        super().__init__(X, Y, kern, likelihood, mean_function,
                         num_latent=num_latent, name=name)
        self.feature = features_mod.inducingpoint_wrapper(feat, Z)
        M = len(self.feature)
        self.V = Param(
            np.zeros((M, self.num_latent)),
            prior=priors.Gaussian(0.0, 1.0),
            name=f"{name}/V",
        )

    def _conditional(self, X, full_cov=False):
        jitter = config.default_jitter()
        Kmm = features_mod.Kuu(self.feature, self.kern, jitter=jitter)
        Kmn = features_mod.Kuf(self.feature, self.kern, X)
        Knn = self.kern.K(X) if full_cov else self.kern.Kdiag(X)
        mu, var = base_conditional(
            Kmn, Kmm, Knn, self.V.value, full_cov=full_cov, white=True
        )
        return mu + self.mean_function(X), var

    def build_likelihood(self):
        fmean, fvar = self._conditional(self.X)
        return jnp.sum(
            self.likelihood.variational_expectations(fmean, fvar, self.Y)
        )

    def build_predict(self, Xnew, full_cov=False):
        return self._conditional(Xnew, full_cov=full_cov)
