"""Coregionalized multi-output regression (intrinsic model of
coregionalization): two correlated outputs observed at different inputs.

Output 2 is a noisy, shifted transformation of output 1 and is only
sparsely observed — the Coregion kernel's learned task covariance
``B = WWᵀ + diag(κ)`` lets output 1's dense observations inform output 2's
predictions. Augmented-input formulation: X = [x, task], the kernel is
RBF(x) * Coregion(task), the likelihood is switched per task.

Run: python examples/10_coregion_multioutput.py
"""

import numpy as np

import os

FAST = os.environ.get("GFS_EXAMPLE_FAST") == "1"  # tiny sizes for tests/test_examples.py smoke runs

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu.likelihoods import Gaussian, SwitchedLikelihood

rng = np.random.RandomState(0)

# dense observations of task 0, sparse of task 1 (correlated: shared latent)
f = lambda x: np.sin(6 * x)
X1 = rng.rand(60, 1)
Y1 = f(X1) + 0.05 * rng.randn(60, 1)
X2 = rng.rand(8, 1)
Y2 = -1.3 * f(X2) + 0.1 + 0.05 * rng.randn(8, 1)

# augmented input/output: last column = task index
X_aug = np.vstack([np.hstack([X1, np.zeros_like(X1)]),
                   np.hstack([X2, np.ones_like(X2)])])
Y_aug = np.vstack([np.hstack([Y1, np.zeros_like(Y1)]),
                   np.hstack([Y2, np.ones_like(Y2)])])

k_input = gfs.kernels.RBF(1, active_dims=[0], lengthscales=0.3)
k_task = gfs.kernels.Coregion(1, output_dim=2, rank=1, active_dims=[1],
                              W=0.5 * np.ones((2, 1)))
kern = k_input * k_task
lik = SwitchedLikelihood([Gaussian(name="t0"), Gaussian(name="t1")])

m = gfs.models.VGP(X_aug, Y_aug, kern=kern, likelihood=lik, num_latent=1)
m, losses = gfs.training.fit(m, num_steps=10 if FAST else 1500, learning_rate=0.02)

B = np.asarray(m.kern.kernels[1]._B()) if hasattr(m.kern, "kernels") else None
# task correlation implied by the learned coregionalization matrix
corr = B[0, 1] / np.sqrt(B[0, 0] * B[1, 1])
print(f"learned task covariance B = {np.round(B, 3).tolist()}")
print(f"implied task correlation: {corr:+.3f} (ground truth strongly "
      f"negative: task2 = -1.3*task1 + const)")

# prediction for the SPARSE task at unseen inputs, informed by task 0
xs = np.linspace(0, 1, 7)[:, None]
Xs_t1 = np.hstack([xs, np.ones_like(xs)])
mu, var = m.predict_f(Xs_t1)
true = -1.3 * f(xs) + 0.1
rmse = float(np.sqrt(np.mean((np.asarray(mu) - true) ** 2)))
print(f"task-1 prediction RMSE from 8 observations: {rmse:.3f} "
      f"(σ ≈ {float(np.mean(np.sqrt(np.asarray(var)))):.3f})")
