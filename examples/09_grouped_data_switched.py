"""Grouped observations: per-group noise AND per-group mean in one GP.

Two sensor groups measure the same latent function; group 1 is noisier and
has a constant offset. The group index rides in the LAST column of X;
``SwitchedLikelihood`` gives each group its own noise variance and
``SwitchedMeanFunction`` its own mean — all trained jointly with a VGP
(non-conjugate machinery handles the heteroscedastic structure).

Run: python examples/09_grouped_data_switched.py
"""

import numpy as np

import os

FAST = os.environ.get("GFS_EXAMPLE_FAST") == "1"  # tiny sizes for tests/test_examples.py smoke runs

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu.likelihoods import Gaussian, SwitchedLikelihood
from gpflow_slim_tpu.mean_functions import Constant, SwitchedMeanFunction

rng = np.random.RandomState(0)
N = 120
x = rng.uniform(0, 1, (N, 1))
group = (rng.rand(N) < 0.5).astype(float)  # ~half the points per group
f = np.sin(8 * x[:, 0])
noise = np.where(group == 0, 0.05, 0.3)
offset = np.where(group == 0, 0.0, 1.5)
y = (f + offset + noise * rng.randn(N))[:, None]

# reference convention: the group index rides in the LAST column of BOTH
# X (read by SwitchedMeanFunction) and Y (read by SwitchedLikelihood)
X = np.concatenate([x, group[:, None]], axis=1)
Y = np.concatenate([y, group[:, None]], axis=1)

lik = SwitchedLikelihood([Gaussian(name="g0"), Gaussian(name="g1")])
mean = SwitchedMeanFunction([Constant(0.0, name="m0"),
                             Constant(0.0, name="m1")])
kern = gfs.kernels.RBF(1, active_dims=[0], lengthscales=0.2)
m = gfs.models.VGP(X, Y, kern=kern, likelihood=lik, mean_function=mean,
                   num_latent=1)

m, losses = gfs.training.fit(m, num_steps=10 if FAST else 1500, learning_rate=0.02)

s0 = float(np.squeeze(np.asarray(m.likelihood.likelihood_list[0].variance.value)))
s1 = float(np.squeeze(np.asarray(m.likelihood.likelihood_list[1].variance.value)))
c0 = float(np.squeeze(np.asarray(m.mean_function.meanfunctions[0].c.value)))
c1 = float(np.squeeze(np.asarray(m.mean_function.meanfunctions[1].c.value)))
print(f"learned noise std: group0 {np.sqrt(s0):.3f} (true 0.05), "
      f"group1 {np.sqrt(s1):.3f} (true 0.30)")
print(f"learned offsets  : group0 {c0:+.3f} (true +0.0), "
      f"group1 {c1:+.3f} (true +1.5)")
