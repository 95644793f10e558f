"""Likelihoods (ref:gpflowSlim/likelihoods.py).

Base-class contract matched to the reference:
  * ``logp(F, Y)`` — elementwise log p(y|f);
  * ``conditional_mean/variance(F)`` — moments of p(y|f);
  * ``predict_mean_and_var(Fmu, Fvar)`` — moments of ∫ p(y|f) q(f) df;
  * ``predict_density(Fmu, Fvar, Y)`` — log ∫ p(y|f) q(f) df;
  * ``variational_expectations(Fmu, Fvar, Y)`` — ∫ log p(y|f) q(f) df;
all defaulting to Gauss–Hermite quadrature (reference default 20 points) with
analytic overrides where the reference has them.

Parity constants preserved: the probit link's numeric clamp
``0.5(1+erf(x/√2))(1−2e−3)+1e−3``, RobustMax's CDF clamp ``(1−2e−4)+1e−4``,
Ordinal's ``+1e−6`` inside the log.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln, ndtr

from . import config, densities
from .params import Module, Param
from .quadrature import hermgauss, ndiagquad
from .transforms import positive

__all__ = [
    "Likelihood",
    "Gaussian",
    "Poisson",
    "Exponential",
    "StudentT",
    "Bernoulli",
    "Gamma",
    "Beta",
    "RobustMax",
    "MultiClass",
    "SwitchedLikelihood",
    "Ordinal",
    "probit",
]


def probit(x):
    """Reference probit link with 1e-3 numeric clamp."""
    return 0.5 * (1.0 + jax.scipy.special.erf(x / np.sqrt(2.0))) * (1 - 2e-3) + 1e-3


def inv_probit(x):  # alias used by some reference code paths
    return probit(x)


class Likelihood(Module):
    def __init__(self, name="likelihood"):
        self.name = name
        self.num_gauss_hermite_points = config.settings().num_gauss_hermite_points

    # -- must override -----------------------------------------------------
    def logp(self, F, Y):
        raise NotImplementedError

    def conditional_mean(self, F):
        raise NotImplementedError

    def conditional_variance(self, F):
        raise NotImplementedError

    # -- quadrature defaults ----------------------------------------------
    def predict_mean_and_var(self, Fmu, Fvar):
        integrand2 = lambda f: self.conditional_variance(f) + jnp.square(
            self.conditional_mean(f)
        )
        E_y, E_y2 = ndiagquad(
            [self.conditional_mean, integrand2],
            self.num_gauss_hermite_points,
            Fmu,
            Fvar,
        )
        V_y = E_y2 - jnp.square(E_y)
        return E_y, V_y

    def predict_density(self, Fmu, Fvar, Y):
        return ndiagquad(
            self.logp, self.num_gauss_hermite_points, Fmu, Fvar,
            logspace=True, Y=Y,
        )

    def variational_expectations(self, Fmu, Fvar, Y):
        return ndiagquad(
            self.logp, self.num_gauss_hermite_points, Fmu, Fvar, Y=Y
        )


class Gaussian(Likelihood):
    def __init__(self, variance=1.0, name="gaussian_likelihood"):
        super().__init__(name=name)
        self.variance = Param(variance, transform=positive(), name=f"{name}/variance")

    def logp(self, F, Y):
        return densities.gaussian(Y, F, self.variance.value)

    def conditional_mean(self, F):
        return F

    def conditional_variance(self, F):
        return jnp.full(jnp.shape(F), jnp.squeeze(self.variance.value))

    def predict_mean_and_var(self, Fmu, Fvar):
        return Fmu, Fvar + self.variance.value

    def predict_density(self, Fmu, Fvar, Y):
        return densities.gaussian(Y, Fmu, Fvar + self.variance.value)

    def variational_expectations(self, Fmu, Fvar, Y):
        v = self.variance.value
        return (
            -0.5 * jnp.log(2.0 * jnp.pi)
            - 0.5 * jnp.log(v)
            - 0.5 * (jnp.square(Y - Fmu) + Fvar) / v
        )


class Poisson(Likelihood):
    """Poisson with exp inverse link and bin-size offset."""

    def __init__(self, invlink=jnp.exp, binsize=1.0, name="poisson_likelihood"):
        super().__init__(name=name)
        self.invlink = invlink
        self.binsize = float(binsize)

    def logp(self, F, Y):
        return densities.poisson(self.invlink(F) * self.binsize, Y)

    def conditional_mean(self, F):
        return self.invlink(F) * self.binsize

    def conditional_variance(self, F):
        return self.invlink(F) * self.binsize

    def variational_expectations(self, Fmu, Fvar, Y):
        if self.invlink is jnp.exp:
            return (
                Y * Fmu
                - jnp.exp(Fmu + Fvar / 2) * self.binsize
                + Y * jnp.log(self.binsize)
                - gammaln(Y + 1)
            )
        return super().variational_expectations(Fmu, Fvar, Y)


class Exponential(Likelihood):
    def __init__(self, invlink=jnp.exp, name="exponential_likelihood"):
        super().__init__(name=name)
        self.invlink = invlink

    def logp(self, F, Y):
        return densities.exponential(self.invlink(F), Y)

    def conditional_mean(self, F):
        return self.invlink(F)

    def conditional_variance(self, F):
        return jnp.square(self.invlink(F))

    def variational_expectations(self, Fmu, Fvar, Y):
        if self.invlink is jnp.exp:
            return -jnp.exp(-Fmu + Fvar / 2) * Y - Fmu
        return super().variational_expectations(Fmu, Fvar, Y)


class StudentT(Likelihood):
    def __init__(self, deg_free=3.0, scale=1.0, name="studentt_likelihood"):
        super().__init__(name=name)
        self.deg_free = float(deg_free)
        self.scale = Param(scale, transform=positive(), name=f"{name}/scale")

    def logp(self, F, Y):
        return densities.student_t(Y, F, self.scale.value, self.deg_free)

    def conditional_mean(self, F):
        return F

    def conditional_variance(self, F):
        var = jnp.square(self.scale.value) * (self.deg_free / (self.deg_free - 2.0))
        return jnp.full(jnp.shape(F), jnp.squeeze(var))


class Bernoulli(Likelihood):
    def __init__(self, invlink=probit, name="bernoulli_likelihood"):
        super().__init__(name=name)
        self.invlink = invlink

    def logp(self, F, Y):
        return densities.bernoulli(self.invlink(F), Y)

    def conditional_mean(self, F):
        return self.invlink(F)

    def conditional_variance(self, F):
        p = self.invlink(F)
        return p - jnp.square(p)

    def predict_mean_and_var(self, Fmu, Fvar):
        if self.invlink is probit:
            p = probit(Fmu / jnp.sqrt(1.0 + Fvar))
            return p, p - jnp.square(p)
        return super().predict_mean_and_var(Fmu, Fvar)

    def predict_density(self, Fmu, Fvar, Y):
        p = self.predict_mean_and_var(Fmu, Fvar)[0]
        return densities.bernoulli(p, Y)


class Gamma(Likelihood):
    """Gamma with exp link on the scale: Y ~ Gamma(shape, scale=invlink(F))."""

    def __init__(self, invlink=jnp.exp, shape=1.0, name="gamma_likelihood"):
        super().__init__(name=name)
        self.invlink = invlink
        self.shape = Param(shape, transform=positive(), name=f"{name}/shape")

    def logp(self, F, Y):
        return densities.gamma(self.shape.value, self.invlink(F), Y)

    def conditional_mean(self, F):
        return self.shape.value * self.invlink(F)

    def conditional_variance(self, F):
        return self.shape.value * jnp.square(self.invlink(F))

    def variational_expectations(self, Fmu, Fvar, Y):
        if self.invlink is jnp.exp:
            shape = self.shape.value
            return (
                -shape * Fmu
                - gammaln(shape)
                + (shape - 1.0) * jnp.log(Y)
                - Y * jnp.exp(-Fmu + Fvar / 2.0)
            )
        return super().variational_expectations(Fmu, Fvar, Y)


class Beta(Likelihood):
    """Reparameterized Beta: mean = invlink(F), total concentration = scale."""

    def __init__(self, invlink=probit, scale=1.0, name="beta_likelihood"):
        super().__init__(name=name)
        self.invlink = invlink
        self.scale = Param(scale, transform=positive(), name=f"{name}/scale")

    def logp(self, F, Y):
        mean = self.invlink(F)
        alpha = mean * self.scale.value
        bet = self.scale.value - alpha
        return densities.beta(alpha, bet, Y)

    def conditional_mean(self, F):
        return self.invlink(F)

    def conditional_variance(self, F):
        mean = self.invlink(F)
        return (mean - jnp.square(mean)) / (self.scale.value + 1.0)


class RobustMax(Module):
    """Robust-max inverse link for multiclass (reference ``RobustMax``)."""

    def __init__(self, num_classes, epsilon=1e-3, name="robustmax"):
        self.num_classes = int(num_classes)
        self.epsilon = float(epsilon)
        self.name = name

    def __call__(self, F):
        i = jnp.argmax(F, axis=1)
        onehot = jax.nn.one_hot(i, self.num_classes, dtype=F.dtype)
        return onehot * (1.0 - self.epsilon) + (1.0 - onehot) * (
            self.epsilon / (self.num_classes - 1.0)
        )

    def prob_is_largest(self, Y, mu, var, gh_x, gh_w):
        """P(F_y = max_k F_k) per datapoint under independent Gaussians.

        mu, var: (N, K); Y: (N, 1) int labels. 1-D quadrature over the
        selected latent, product of clamped normal CDFs over the rest.
        """
        Y = jnp.asarray(Y, dtype=jnp.int32).reshape(-1)
        N, K = mu.shape
        dtype = mu.dtype
        gh_x = jnp.asarray(gh_x, dtype=dtype).reshape(1, -1)
        gh_w = jnp.asarray(gh_w, dtype=dtype).reshape(-1, 1)

        mu_sel = jnp.take_along_axis(mu, Y[:, None], axis=1)  # (N, 1)
        var_sel = jnp.take_along_axis(var, Y[:, None], axis=1)

        X = mu_sel + gh_x * jnp.sqrt(
            jnp.maximum(2.0 * var_sel, 1e-10)
        )  # (N, H)
        dist = (X[:, :, None] - mu[:, None, :]) / jnp.sqrt(
            jnp.maximum(var[:, None, :], 1e-10)
        )  # (N, H, K)
        cdfs = ndtr(dist)
        cdfs = cdfs * (1 - 2e-4) + 1e-4  # reference clamp
        # the selected class contributes factor 1
        onehot = jax.nn.one_hot(Y, K, dtype=dtype)  # (N, K)
        cdfs = cdfs * (1.0 - onehot[:, None, :]) + onehot[:, None, :]
        prod = jnp.prod(cdfs, axis=2)  # (N, H)
        p = (prod @ gh_w) / jnp.sqrt(jnp.asarray(np.pi, dtype=dtype))
        return p  # (N, 1)


class MultiClass(Likelihood):
    def __init__(self, num_classes, invlink=None, name="multiclass_likelihood"):
        super().__init__(name=name)
        self.num_classes = int(num_classes)
        if invlink is None:
            invlink = RobustMax(num_classes)
        if not isinstance(invlink, RobustMax):
            raise NotImplementedError("MultiClass requires a RobustMax invlink")
        self.invlink = invlink

    def logp(self, F, Y):
        hits = jnp.equal(
            jnp.argmax(F, axis=1)[:, None], jnp.asarray(Y, dtype=jnp.int32)
        )
        eps = self.invlink.epsilon
        yes = jnp.full(jnp.shape(Y), np.log(1.0 - eps))
        no = jnp.full(jnp.shape(Y), np.log(eps / (self.num_classes - 1.0)))
        return jnp.where(hits, yes, no).astype(F.dtype)

    def variational_expectations(self, Fmu, Fvar, Y):
        gh_x, gh_w = hermgauss(self.num_gauss_hermite_points)
        p = self.invlink.prob_is_largest(Y, Fmu, Fvar, gh_x, gh_w)
        eps = self.invlink.epsilon
        return p * np.log(1.0 - eps) + (1.0 - p) * np.log(
            eps / (self.num_classes - 1.0)
        )

    def predict_mean_and_var(self, Fmu, Fvar):
        possible_outputs = [
            jnp.full((Fmu.shape[0], 1), i, dtype=jnp.int32)
            for i in range(self.num_classes)
        ]
        ps = [self._density(Fmu, Fvar, po) for po in possible_outputs]
        ps = jnp.concatenate(ps, axis=1)  # (N, K)
        return ps, ps - jnp.square(ps)

    def _density(self, Fmu, Fvar, Y):
        gh_x, gh_w = hermgauss(self.num_gauss_hermite_points)
        p = self.invlink.prob_is_largest(Y, Fmu, Fvar, gh_x, gh_w)
        eps = self.invlink.epsilon
        return p * (1.0 - eps) + (1.0 - p) * (eps / (self.num_classes - 1.0))

    def predict_density(self, Fmu, Fvar, Y):
        return jnp.log(self._density(Fmu, Fvar, Y))

    def conditional_mean(self, F):
        return self.invlink(F)

    def conditional_variance(self, F):
        p = self.conditional_mean(F)
        return p - jnp.square(p)


class SwitchedLikelihood(Likelihood):
    """Per-datapoint likelihood selection by the last column of Y.

    The reference partitions data with ``tf.dynamic_partition``; static-shape
    XLA redesign: evaluate every sub-likelihood on all points and
    mask-combine — same math, no dynamic shapes, trivially vmappable.
    """

    # a y-value inside the support of every provided likelihood (positive,
    # in (0,1)) substituted at masked-out rows so restricted-support
    # likelihoods (Gamma/Beta/Exponential…) never see another output's data
    # — NaN·0 = NaN would otherwise poison the combine AND its gradients
    _SAFE_Y = 0.5

    def __init__(self, likelihood_list, name="switched_likelihood"):
        super().__init__(name=name)
        self.likelihood_list = list(likelihood_list)

    def _combine(self, method, Y, *fargs):
        ind = jnp.asarray(Y[..., -1], dtype=jnp.int32)
        Ydata = Y[..., :-1]
        out = None
        for i, lik in enumerate(self.likelihood_list):
            mask = jnp.equal(ind, i)[..., None]
            Ysafe = jnp.where(mask, Ydata, self._SAFE_Y)
            val = getattr(lik, method)(*fargs, Ysafe)
            contrib = jnp.where(mask, val, 0.0)
            out = contrib if out is None else out + contrib
        return out

    def logp(self, F, Y):
        return self._combine("logp", Y, F)

    def variational_expectations(self, Fmu, Fvar, Y):
        return self._combine("variational_expectations", Y, Fmu, Fvar)

    def predict_density(self, Fmu, Fvar, Y):
        return self._combine("predict_density", Y, Fmu, Fvar)


class Ordinal(Likelihood):
    """Ordinal regression via a latent GP sliced by bin edges."""

    def __init__(self, bin_edges, name="ordinal_likelihood"):
        super().__init__(name=name)
        self.bin_edges = np.asarray(bin_edges, dtype=np.float64)
        self.num_bins = len(self.bin_edges) + 1
        self.sigma = Param(1.0, transform=positive(), name=f"{name}/sigma")

    def _scaled_bins(self, dtype):
        sigma = self.sigma.value
        edges = jnp.asarray(self.bin_edges, dtype=dtype) / sigma
        inf = jnp.asarray([np.inf], dtype=dtype)
        left = jnp.concatenate([edges, inf])  # upper edge per bin
        right = jnp.concatenate([-inf, edges])  # lower edge per bin
        return left, right

    def logp(self, F, Y):
        left, right = self._scaled_bins(F.dtype)
        Yi = jnp.asarray(Y, dtype=jnp.int32)
        sel_left = jnp.take(left, Yi)
        sel_right = jnp.take(right, Yi)
        Fs = F / self.sigma.value
        return jnp.log(ndtr(sel_left - Fs) - ndtr(sel_right - Fs) + 1e-6)

    def conditional_mean(self, F):
        left, right = self._scaled_bins(F.dtype)
        Fs = F / self.sigma.value  # (..., 1)
        # P(Y=k|F) for all k: (..., num_bins)
        probs = ndtr(left - Fs) - ndtr(right - Fs)
        ys = jnp.arange(self.num_bins, dtype=F.dtype)
        return jnp.sum(probs * ys, axis=-1, keepdims=True)

    def conditional_variance(self, F):
        left, right = self._scaled_bins(F.dtype)
        Fs = F / self.sigma.value
        probs = ndtr(left - Fs) - ndtr(right - Fs)
        ys = jnp.arange(self.num_bins, dtype=F.dtype)
        Ey = jnp.sum(probs * ys, axis=-1, keepdims=True)
        Ey2 = jnp.sum(probs * jnp.square(ys), axis=-1, keepdims=True)
        return Ey2 - jnp.square(Ey)
