"""Production serving: precompute the posterior once, checkpoint it, and
serve O(N·N*) predictions from the restored cache.

Run: python examples/07_serving_posterior.py
"""

import os
import tempfile
import time

import numpy as np

FAST = os.environ.get("GFS_EXAMPLE_FAST") == "1"  # tiny sizes for tests/test_examples.py smoke runs

import gpflow_slim_tpu as gfs

rng = np.random.RandomState(0)
X = rng.uniform(0, 1, (256 if FAST else 2000, 1))
Y = np.sin(12 * X) + 0.1 * rng.randn(*X.shape)

m = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.1))
m, _ = gfs.training.fit(m, num_steps=10 if FAST else 200, learning_rate=0.05)

# training side: factorize once, checkpoint the posterior
post = m.posterior()
path = gfs.utils.save_checkpoint(
    tempfile.mktemp(prefix="gp_posterior_"), post
)

# serving side: restore and answer queries without refactorizing
post2 = gfs.utils.load_checkpoint(path, post)
import jax

predict = jax.jit(lambda p, xt: p.predict_y(xt))
Xq = np.linspace(0, 1, 256)[:, None]
mean, var = predict(post2, Xq)  # compile
t0 = time.perf_counter()
reps = 2 if FAST else 20
for _ in range(reps):
    mean, var = predict(post2, Xq)
jax.block_until_ready(var)
dt = (time.perf_counter() - t0) / reps
print(f"serving latency (N={X.shape[0]} cache, 256 queries): {dt*1000:.2f} ms")
print(f"pred mean range: [{float(np.min(np.asarray(mean))):.2f}, "
      f"{float(np.max(np.asarray(mean))):.2f}]")
