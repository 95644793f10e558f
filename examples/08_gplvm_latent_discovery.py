"""GP-LVM: unsupervised latent-structure discovery from high-dim outputs.

Generates 12-dimensional observations driven by a 2-D latent manifold,
then recovers the latents two ways:
  * GPLVM — MAP latents (PCA-initialized, trained jointly with hypers);
  * BayesianGPLVM — variational q(X) with inducing points (ψ-statistics
    collapsed bound), giving per-point latent uncertainty.

Run: python examples/08_gplvm_latent_discovery.py
"""

import numpy as np

import os

FAST = os.environ.get("GFS_EXAMPLE_FAST") == "1"  # tiny sizes for tests/test_examples.py smoke runs

import gpflow_slim_tpu as gfs

rng = np.random.RandomState(0)
N, P, Q = 80, 12, 2

# ground-truth latents on a 2-D manifold, mapped through random smooth maps
X_true = rng.randn(N, Q)
W = rng.randn(Q, P)
Y = np.tanh(X_true @ W) + 0.05 * rng.randn(N, P)

# --- MAP GPLVM --------------------------------------------------------------
m = gfs.models.GPLVM(Y, latent_dim=Q)
m, losses = gfs.training.fit(m, num_steps=10 if FAST else 800, learning_rate=0.01)
X_map = np.asarray(m.X.value, dtype=np.float64)

# latent recovery quality: best linear alignment to the true latents
A = np.linalg.pinv(X_map) @ X_true
r2 = 1 - np.sum((X_map @ A - X_true) ** 2) / np.sum(X_true**2)
print(f"GPLVM     : objective {float(losses[-1]):.1f}, latent R² {r2:.3f}")

# --- Bayesian GPLVM ---------------------------------------------------------
X0 = gfs.models.pca_reduce(Y, Q)
mb = gfs.models.BayesianGPLVM(
    X0, np.full((N, Q), 0.1), Y, gfs.kernels.RBF(Q, ARD=True), M=16
)
# lr 0.005: inducing points chasing moving latents need gentler steps (f32)
mb, losses_b = gfs.training.fit(mb, num_steps=10 if FAST else 800, learning_rate=0.005)
Xb = np.asarray(mb.X_mean.value, dtype=np.float64)
Ab = np.linalg.pinv(Xb) @ X_true
r2b = 1 - np.sum((Xb @ Ab - X_true) ** 2) / np.sum(X_true**2)
mean_var = float(np.mean(np.asarray(mb.X_var.value)))
print(f"BGPLVM    : ELBO {-float(losses_b[-1]):.1f}, latent R² {r2b:.3f}, "
      f"mean q(X) var {mean_var:.4f}")
