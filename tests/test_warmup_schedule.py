"""Stan-style windowed warmup (mcmc.nuts.warmup_schedule + NUTS R̂).

The reference lineage has no NUTS at all (SURVEY §3.4); the adaptation
schedule follows Stan's fast / slow-doubling / fast design, which is the
fix for the round-1 unconverged-benchmark finding (R̂ = 1.16 at
warmup=128 under the old half/half split).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gpflow_slim_tpu.mcmc import nuts
from gpflow_slim_tpu.mcmc.diagnostics import (
    effective_sample_size,
    potential_scale_reduction as rhat,
)
from gpflow_slim_tpu.mcmc.nuts import warmup_schedule


def test_schedule_structure_default():
    ws = warmup_schedule(1000)
    assert ws[0] == ("fast", 75)
    assert ws[-1] == ("fast", 50)
    slow = [n for kind, n in ws[1:-1] if kind == "slow"]
    assert all(kind == "slow" for kind, _ in ws[1:-1])
    assert sum(n for _, n in ws) == 1000
    # doubling until the last window absorbs the remainder
    assert slow[0] == 25 and slow[1] == 50 and slow[2] == 100
    assert slow[-1] >= slow[-2]


def test_schedule_short_warmup_scales():
    for n in (20, 64, 128, 149):
        ws = warmup_schedule(n)
        assert sum(s for _, s in ws) == n
        assert ws[0][0] == "fast" and ws[-1][0] == "fast"
        assert any(k == "slow" for k, _ in ws)
    assert warmup_schedule(10) == [("fast", 10)]
    assert warmup_schedule(0) == []


def test_schedule_exhaustive_sums():
    for n in range(151, 400, 7):
        ws = warmup_schedule(n)
        assert sum(s for _, s in ws) == n
        assert all(s > 0 for _, s in ws)


def test_nuts_windowed_warmup_converges_ill_scaled_gaussian():
    """4 chains on a badly scaled Gaussian: windowed mass adaptation must
    reach R̂ ≤ 1.01 and decent ESS with a modest warmup — the round-1
    half/half split needed far more."""
    scales = jnp.array([0.05, 1.0, 20.0])

    def logp(x):
        return -0.5 * jnp.sum(jnp.square(x / scales))

    def one_chain(key):
        k_init, k_run = jax.random.split(key)
        x0 = jax.random.normal(k_init, (3,)) * scales
        samples, info = nuts(
            logp, x0, k_run, num_samples=500, num_warmup=400,
        )
        return samples, info["inv_mass"]

    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    samples, inv_mass = jax.vmap(one_chain)(keys)  # (4, 500, 3)

    r = rhat(samples)
    assert np.all(np.asarray(r) < 1.01), f"R-hat {r}"
    ess = effective_sample_size(samples)
    assert np.all(np.asarray(ess) > 100), f"ESS {ess}"
    # the adapted metric must reflect the true scales (ratio ≈ scale²)
    ratio = np.asarray(inv_mass).mean(0)
    assert ratio[2] / ratio[0] > 1e3
