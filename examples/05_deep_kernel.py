"""Deep kernel: MLP-warped inputs trained jointly with GP hyperparameters
(the NKN/fBNN composability pattern, SURVEY §3.5).

Run: python examples/05_deep_kernel.py
"""

import jax
import numpy as np

import os

FAST = os.environ.get("GFS_EXAMPLE_FAST") == "1"  # tiny sizes for tests/test_examples.py smoke runs

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu.kernels_deep import DeepKernel, mlp_warp

rng = np.random.RandomState(0)
N = 300
X = rng.uniform(-1, 1, (N, 2))
Y = np.sin(3 * (X[:, :1] + 0.5 * X[:, 1:2])) + 0.05 * rng.randn(N, 1)

warp_fn, warp_params = mlp_warp(jax.random.PRNGKey(0), [2, 16, 1])
kern = DeepKernel(2, gfs.kernels.RBF(1, lengthscales=0.5), warp_fn,
                  warp_params)
m = gfs.models.GPR(X, Y, kern=kern)

m, losses = gfs.training.fit(m, num_steps=10 if FAST else 500, learning_rate=0.02)
mu, _ = m.predict_f(X)
rmse = float(np.sqrt(np.mean((np.asarray(mu) - Y) ** 2)))
print(f"objective {float(m.objective()):.1f}, train RMSE {rmse:.4f}")
