"""NUTS over GPR kernel hyperparameters, parallel chains with shared
step-size adaptation (BASELINE config #4 shape).

Run: python examples/03_nuts_hyperparameters.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import os

FAST = os.environ.get("GFS_EXAMPLE_FAST") == "1"  # tiny sizes for tests/test_examples.py smoke runs

import gpflow_slim_tpu as gfs

rng = np.random.RandomState(0)
X = rng.uniform(0, 1, (80, 1))
Y = np.sin(6 * X) + 0.2 * rng.randn(80, 1)

k = gfs.kernels.RBF(1)
k.variance = gfs.params.Param(
    1.0, transform=gfs.transforms.positive(),
    prior=gfs.priors.LogNormal(0.0, 1.0), name="variance")
k.lengthscales = gfs.params.Param(
    0.3, transform=gfs.transforms.positive(),
    prior=gfs.priors.LogNormal(-1.0, 1.0), name="lengthscales")
m = gfs.models.GPR(X, Y, kern=k)
m.likelihood.variance = gfs.params.Param(
    0.05, transform=gfs.transforms.positive(),
    prior=gfs.priors.LogNormal(-2.0, 1.0), name="noise")

logprob, x0, unpack = gfs.mcmc.model_logprob(m)

C = 2 if FAST else 4  # scale up freely on real hardware
samples, info = gfs.parallel.sample_chains(
    logprob, jnp.tile(x0, (C, 1)), jax.random.PRNGKey(0),
    num_samples=8 if FAST else 300, sampler="nuts",
    num_warmup=8 if FAST else 200,
)
s = np.asarray(samples)
print("chains:", s.shape)
print("split-R-hat:", np.round(gfs.mcmc.potential_scale_reduction(s), 3))
print("bulk ESS:  ", np.round(gfs.mcmc.effective_sample_size(s), 1))

noise = np.asarray(jax.vmap(jax.vmap(
    lambda v: unpack(v).likelihood.variance.value))(samples))
print(f"posterior noise variance: median={np.median(noise):.4f} "
      f"(true 0.04)")
