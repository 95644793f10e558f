"""SVGP binary classification with natural gradients (BASELINE config #3
shape, scaled down).

Run: python examples/02_svgp_classification.py
"""

import jax
import numpy as np

import os

FAST = os.environ.get("GFS_EXAMPLE_FAST") == "1"  # tiny sizes for tests/test_examples.py smoke runs

import gpflow_slim_tpu as gfs

rng = np.random.RandomState(0)
N = 200 if FAST else 2000
X = rng.uniform(0, 1, (N, 1))
Y = (np.sin(10 * X) > 0).astype(float)

m = gfs.models.SVGP(
    X, Y,
    kern=gfs.kernels.RBF(1, lengthscales=0.2),
    likelihood=gfs.likelihoods.Bernoulli(),
    Z=np.linspace(0, 1, 32)[:, None],
)

m, losses = gfs.training.fit_svgp_natgrad(
    m, num_steps=5 if FAST else 300, key=jax.random.PRNGKey(0),
    gamma=0.2, learning_rate=0.05, batch_size=64 if FAST else 256,
)

p, _ = m.predict_y(X)
acc = float(np.mean((np.asarray(p) > 0.5) == (Y > 0.5)))
print(f"ELBO: {float(m.build_likelihood()):.1f}   accuracy: {acc:.3f}")
