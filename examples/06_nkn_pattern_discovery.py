"""Neural Kernel Network: learn kernel structure (trend + periodicity)
from data (Sun et al. 2018 — the pattern the reference library was built
to serve).

Run: python examples/06_nkn_pattern_discovery.py
"""

import numpy as np

import os

FAST = os.environ.get("GFS_EXAMPLE_FAST") == "1"  # tiny sizes for tests/test_examples.py smoke runs

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu.kernels_nkn import NKN, NKNLinear, NKNProduct

rng = np.random.RandomState(0)
X = np.linspace(0, 2, 200)[:, None]
Y = 0.5 * X + 0.5 * np.sin(8 * X) + 0.05 * rng.randn(200, 1)

primitives = [
    gfs.kernels.RBF(1, lengthscales=0.5, name="p_rbf"),
    gfs.kernels.Periodic(1, period=0.7, name="p_per"),
    gfs.kernels.Linear(1, name="p_lin"),
    gfs.kernels.Matern32(1, lengthscales=1.0, name="p_mat"),
]
kern = NKN(1, primitives, [
    NKNLinear(4, 4, name="l0"),
    NKNProduct(4, 2, name="l1"),
    NKNLinear(2, 1, name="l2"),
])

m = gfs.models.GPR(X, Y, kern=kern)
m, _ = gfs.training.fit(m, num_steps=10 if FAST else 400, learning_rate=0.03)

mu, _ = m.predict_f(X)
rmse = float(np.sqrt(np.mean((np.asarray(mu) - Y) ** 2)))
print(f"objective {float(m.objective()):.1f}, train RMSE {rmse:.4f}")
gfs.utils.print_summary(m.kern.layers[0])
