"""MCMC plumbing: model ↔ flat unconstrained vector, dual averaging, Welford.

The reference samples GPMC/SGPMC posteriors with an external GPflow-1.x
leapfrog HMC over the unconstrained TF variables (SURVEY §3.4). Here the
chain state is the packed trainable unconstrained vector
(``params.pack_trainable``); the target is ``model.log_posterior()`` which
includes prior log-probs and transform log-Jacobians, so sampling in
unconstrained coordinates is measure-correct.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..params import pack_trainable


def model_logprob(model):
    """Return ``(logprob_fn, x0, unpack)`` for MCMC over a model's params.

    ``logprob_fn(v)`` = log_posterior of the model with trainable
    unconstrained leaves replaced from the flat vector ``v``.
    """
    x0, unpack = pack_trainable(model)

    def logprob_fn(v):
        return unpack(v).log_posterior()

    return logprob_fn, x0, unpack


class DualAveragingState(NamedTuple):
    """Nesterov dual averaging for step-size adaptation (Hoffman & Gelman)."""

    log_step: jnp.ndarray
    log_step_avg: jnp.ndarray
    gradient_avg: jnp.ndarray
    t: jnp.ndarray
    mu: jnp.ndarray


def da_init(step_size):
    step_size = jnp.asarray(step_size)
    return DualAveragingState(
        log_step=jnp.log(step_size),
        log_step_avg=jnp.log(step_size),
        gradient_avg=jnp.zeros_like(step_size),
        t=jnp.zeros_like(step_size),
        mu=jnp.log(10.0 * step_size),
    )


def da_update(state: DualAveragingState, accept_prob, target=0.8,
              gamma=0.05, t0=10.0, kappa=0.75):
    t = state.t + 1.0
    g = target - accept_prob
    gradient_avg = (1 - 1 / (t + t0)) * state.gradient_avg + g / (t + t0)
    log_step = state.mu - jnp.sqrt(t) / gamma * gradient_avg
    eta = t ** (-kappa)
    log_step_avg = eta * log_step + (1 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, gradient_avg, t, state.mu)


class WelfordState(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray
    count: jnp.ndarray


def welford_init(dim, dtype):
    return WelfordState(
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
        count=jnp.zeros((), dtype),
    )


def welford_update(state: WelfordState, x):
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean, m2, count)


def welford_variance(state: WelfordState, regularize=True):
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularize:
        # Stan's shrinkage toward unit metric
        n = state.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


def leapfrog(logprob_grad_fn: Callable, z, r, grad, step_size, inv_mass):
    """One leapfrog step from (z, r) with cached grad ∇logp(z).

    Returns (z', r', logp', grad') — one gradient evaluation per step, the
    metric of BASELINE's "leapfrog at speed-of-light" requirement.
    """
    r_half = r + 0.5 * step_size * grad
    z_new = z + step_size * inv_mass * r_half
    lp_new, grad_new = logprob_grad_fn(z_new)
    r_new = r_half + 0.5 * step_size * grad_new
    return z_new, r_new, lp_new, grad_new


def kinetic_energy(r, inv_mass):
    return 0.5 * jnp.sum(jnp.square(r) * inv_mass)
