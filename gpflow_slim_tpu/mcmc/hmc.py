"""Leapfrog HMC with GPflow-1.x sampler semantics (SURVEY App. A).

Per sample: step size ε drawn uniformly from ±[ε(1−jitter), ε(1+jitter)]
(random sign — a reversed trajectory is measure-preserving), leapfrog count
L ~ U{lmin, …, lmax−1}, standard leapfrog, Metropolis accept, burn + thin.
Entirely jittable: ``lax.scan`` over samples, ``lax.fori_loop`` over
leapfrog steps. Optional dual-averaging step-size adaptation during burn-in
(a north-star addition; off by default for reference parity).

Chains: ``vmap`` this sampler for within-chip chains; ``parallel.chains``
shards chains across devices with ``psum``-shared adaptation statistics.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .base import da_init, da_update, kinetic_energy, leapfrog


class HMCState(NamedTuple):
    z: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray


def _hmc_transition(logprob_grad_fn, state: HMCState, key, epsilon,
                    lmin, lmax, epsilon_jitter, inv_mass):
    k_eps, k_sign, k_L, k_mom, k_acc = jax.random.split(key, 5)
    dtype = state.z.dtype

    eps_mag = jax.random.uniform(
        k_eps, (), dtype,
        minval=epsilon * (1.0 - epsilon_jitter),
        maxval=epsilon * (1.0 + epsilon_jitter),
    )
    sign = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0).astype(dtype)
    eps = eps_mag * sign
    L = jax.random.randint(k_L, (), lmin, jnp.maximum(lmax, lmin + 1))

    r0 = jax.random.normal(k_mom, state.z.shape, dtype) / jnp.sqrt(inv_mass)
    H0 = state.logp - kinetic_energy(r0, inv_mass)

    def body(i, carry):
        z, r, lp, grad = carry
        z, r, lp, grad = leapfrog(logprob_grad_fn, z, r, grad, eps, inv_mass)
        return (z, r, lp, grad)

    z1, r1, lp1, grad1 = jax.lax.fori_loop(
        0, L, body, (state.z, r0, state.logp, state.grad)
    )
    H1 = lp1 - kinetic_energy(r1, inv_mass)
    log_accept_ratio = H1 - H0
    # NaN-robust: an f32 posterior can return NaN at extreme proposals;
    # the `accept` comparison below already rejects NaN, but the accept
    # STATISTIC would carry NaN into dual averaging — treat NaN as
    # log-ratio −inf (certain rejection), matching the NUTS leaf guard.
    log_accept_ratio = jnp.where(
        jnp.isnan(log_accept_ratio), -jnp.inf, log_accept_ratio
    )
    accept_prob = jnp.minimum(1.0, jnp.exp(log_accept_ratio))
    accept = jnp.log(jax.random.uniform(k_acc, (), dtype)) < log_accept_ratio
    new_state = HMCState(
        z=jnp.where(accept, z1, state.z),
        logp=jnp.where(accept, lp1, state.logp),
        grad=jnp.where(accept, grad1, state.grad),
    )
    return new_state, accept_prob


def hmc(
    logprob_fn: Callable,
    x0,
    key,
    num_samples: int,
    epsilon: float = 0.01,
    lmin: int = 10,
    lmax: int = 21,
    thin: int = 1,
    burn: int = 0,
    epsilon_jitter: float = 0.1,
    inv_mass=None,
    adapt_step_size: bool = False,
    target_accept: float = 0.8,
    adapt_axis=None,
):
    """Run one HMC chain; returns ``(samples, dict(logp, accept_rate, epsilon))``.

    samples: (num_samples, dim) — post burn-in, thinned. ``adapt_axis``: a
    mapped axis name (or tuple) over which dual-averaging accept statistics
    are ``pmean``-shared across chains during burn-in.
    """
    x0 = jnp.asarray(x0)
    if inv_mass is None:
        inv_mass = jnp.ones_like(x0)

    logprob_grad_fn = jax.value_and_grad(logprob_fn)
    lp0, g0 = logprob_grad_fn(x0)
    state0 = HMCState(x0, lp0, g0)

    # ---- burn-in (with optional dual-averaging adaptation) ----------------
    da0 = da_init(jnp.asarray(epsilon, x0.dtype))

    def burn_step(carry, k):
        state, da = carry
        eps = jnp.exp(da.log_step) if adapt_step_size else jnp.asarray(
            epsilon, x0.dtype
        )
        state, accept_prob = _hmc_transition(
            logprob_grad_fn, state, k, eps, lmin, lmax, epsilon_jitter,
            inv_mass,
        )
        if adapt_step_size:
            stat = accept_prob
            if adapt_axis is not None:
                stat = jax.lax.pmean(stat, adapt_axis)
            da = da_update(da, stat, target=target_accept)
        return (state, da), accept_prob

    keys_burn = jax.random.split(key, burn + 1)
    key = keys_burn[0]
    if burn > 0:
        (state0, da0), _ = jax.lax.scan(burn_step, (state0, da0), keys_burn[1:])
    eps_final = jnp.exp(da0.log_step_avg) if adapt_step_size else jnp.asarray(
        epsilon, x0.dtype
    )

    # ---- sampling, thinned ------------------------------------------------
    def sample_step(state, k):
        def inner(s, kk):
            s, ap = _hmc_transition(
                logprob_grad_fn, s, kk, eps_final, lmin, lmax,
                epsilon_jitter, inv_mass,
            )
            return s, ap

        ks = jax.random.split(k, thin)
        state, aps = jax.lax.scan(inner, state, ks)
        return state, (state.z, state.logp, jnp.mean(aps))

    keys = jax.random.split(key, num_samples)
    _, (samples, logps, accept_probs) = jax.lax.scan(
        sample_step, state0, keys
    )
    info = {
        "logp": logps,
        "accept_rate": jnp.mean(accept_probs),
        "epsilon": eps_final,
    }
    return samples, info
