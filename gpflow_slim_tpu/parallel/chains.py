"""MCMC chain parallelism: vmap within chip × shard_map across chips.

The reference runs a single external chain (SURVEY §2.2). Here chains are a
mesh axis: ``sample_chains`` shards C chains over the ``chains`` mesh axis,
vmaps the per-device remainder, and (for NUTS) shares warmup adaptation
statistics across ALL chains via ``lax.pmean`` over both the vmap and mesh
axes — the BASELINE "8+ parallel chains with shared step-size adaptation".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mcmc.hmc import hmc as _hmc
from ..mcmc.nuts import nuts as _nuts

__all__ = ["sample_chains"]


def sample_chains(
    logprob_fn,
    x0s,
    key,
    num_samples: int,
    sampler: str = "nuts",
    mesh: Mesh | None = None,
    axis: str = "chains",
    shared_adaptation: bool = True,
    **sampler_kwargs,
):
    """Run ``C = x0s.shape[0]`` chains in parallel.

    Without a mesh: pure vmap (single device). With a mesh: shard_map over
    ``axis`` with per-device vmap inside; C must be divisible by the mesh
    axis size. Returns ``(samples (C, S, dim), info)``.
    """
    x0s = jnp.asarray(x0s)
    C = x0s.shape[0]
    keys = jax.random.split(key, C)

    if sampler == "nuts":
        base = _nuts
        adapt_kw = "adapt_axis"
    elif sampler == "hmc":
        base = _hmc
        adapt_kw = "adapt_axis"  # effective when adapt_step_size=True
    else:
        raise ValueError(f"unknown sampler {sampler!r}")

    if mesh is None:
        kw = dict(sampler_kwargs)
        if adapt_kw and shared_adaptation:
            kw[adapt_kw] = "chains_local"
        run = jax.vmap(
            lambda x, k: base(logprob_fn, x, k, num_samples, **kw),
            axis_name="chains_local",
        )
        return jax.jit(run)(x0s, keys)

    from jax import shard_map

    n_dev = mesh.shape[axis]
    if C % n_dev != 0:
        raise ValueError(f"{C} chains not divisible by mesh axis {n_dev}")

    kw = dict(sampler_kwargs)
    if adapt_kw and shared_adaptation:
        kw[adapt_kw] = ("chains_local", axis)

    def per_device(x_shard, k_shard):
        return jax.vmap(
            lambda x, k: base(logprob_fn, x, k, num_samples, **kw),
            axis_name="chains_local",
        )(x_shard, k_shard)

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded)(x0s, keys)
