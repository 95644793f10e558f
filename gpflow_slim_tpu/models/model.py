"""Model base classes (ref:gpflowSlim/models/model.py).

``Model.objective() = −(build_likelihood() + Σ prior_logp)`` — the sign
convention of the reference's ``objective`` tensor. All methods are pure
functions of ``self`` (the model IS the parameter pytree), so the canonical
training step is simply::

    loss, grads = jax.value_and_grad(lambda m: m.objective())(model)

``GPModel`` adds the predictive API: ``predict_f`` (→ ``build_predict``),
``predict_f_full_cov``, ``predict_f_samples``, ``predict_y``,
``predict_density``, routed through the likelihood exactly as the reference.

Shape convention: for ``full_cov=True`` predictions we return ``(P, N, N)``
covariances uniformly (the reference lineage is inconsistent — (N,N,P) in
GPR/SGPR, (P,N,N) in conditionals; we standardize on the latter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cholesky

from .. import config
from ..mean_functions import Zero
from ..params import Module, log_prior


class Model(Module):
    def __init__(self, name="model"):
        self.name = name

    def build_likelihood(self):
        raise NotImplementedError

    def log_prior(self):
        return log_prior(self)

    def objective(self):
        """Negative (log-likelihood + log-prior); minimize this."""
        return -(self.build_likelihood() + self.log_prior())

    def log_posterior(self):
        """build_likelihood + log_prior (for MCMC); = −objective."""
        return self.build_likelihood() + self.log_prior()

    # reference-API aliases (GPflow-1.x `compute_*` autoflow names)
    def compute_log_likelihood(self):
        return self.build_likelihood()

    def compute_log_prior(self):
        return self.log_prior()


class GPModel(Model):
    def __init__(self, X, Y, kern, likelihood, mean_function=None,
                 num_latent=None, name="gp_model"):
        super().__init__(name=name)
        dtype = config.default_float()
        X = jnp.asarray(X, dtype=dtype)
        Y = jnp.asarray(Y, dtype=dtype)
        if X.ndim != 2 or Y.ndim != 2:
            raise ValueError(
                f"X and Y must be rank-2 (N, D)/(N, P); got X {X.shape}, Y {Y.shape}"
            )
        if X.shape[0] != Y.shape[0]:
            raise ValueError(
                f"X and Y must agree on N; got X {X.shape}, Y {Y.shape}"
            )
        self.X = X
        self.Y = Y
        self.kern = kern
        self.likelihood = likelihood
        self.mean_function = mean_function if mean_function is not None else Zero()
        self.num_latent = int(num_latent if num_latent is not None else Y.shape[1])

    # -- to be provided by concrete models ---------------------------------
    def build_predict(self, Xnew, full_cov=False):
        raise NotImplementedError

    # -- public predictive API (reference names) ---------------------------
    def predict_f(self, Xnew):
        """Mean and variance of the latent f at Xnew: (N*, P), (N*, P)."""
        return self.build_predict(Xnew, full_cov=False)

    def predict_f_full_cov(self, Xnew):
        """Mean (N*, P) and full covariance (P, N*, N*) of latent f."""
        return self.build_predict(Xnew, full_cov=True)

    def predict_f_samples(self, Xnew, num_samples, key):
        """Joint samples of f at Xnew: (num_samples, N*, P)."""
        mu, var = self.build_predict(Xnew, full_cov=True)  # (N,P), (P,N,N)
        jitter = config.default_jitter()
        N = mu.shape[0]
        eye = jitter * jnp.eye(N, dtype=mu.dtype)

        def sample_one(cov_p, mu_p, k):
            L = cholesky(cov_p + eye, lower=True)
            V = jax.random.normal(k, (N, num_samples), dtype=mu.dtype)
            return (mu_p[:, None] + L @ V).T  # (num_samples, N)

        keys = jax.random.split(key, self.num_latent)
        samples = jax.vmap(sample_one)(var, mu.T, keys)  # (P, S, N)
        return jnp.transpose(samples, (1, 2, 0))  # (S, N, P)

    def predict_y(self, Xnew):
        """Mean and variance of observations y at Xnew."""
        pred_f_mean, pred_f_var = self.build_predict(Xnew, full_cov=False)
        return self.likelihood.predict_mean_and_var(pred_f_mean, pred_f_var)

    def predict_density(self, Xnew, Ynew):
        """Log predictive density of Ynew at Xnew."""
        pred_f_mean, pred_f_var = self.build_predict(Xnew, full_cov=False)
        return self.likelihood.predict_density(pred_f_mean, pred_f_var, Ynew)
