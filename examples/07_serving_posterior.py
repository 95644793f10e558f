"""Production serving: precompute the posterior once, checkpoint it, and
serve O(N·N*) predictions from the restored cache.

Run: python examples/07_serving_posterior.py
"""

import tempfile
import time

import numpy as np

import gpflow_slim_tpu as gfs

rng = np.random.RandomState(0)
X = rng.uniform(0, 1, (2000, 1))
Y = np.sin(12 * X) + 0.1 * rng.randn(2000, 1)

m = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.1))
m, _ = gfs.training.fit(m, num_steps=200, learning_rate=0.05)

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
for _ in range(20):
    mean, var = predict(post2, Xq)
jax.block_until_ready(var)
dt = (time.perf_counter() - t0) / 20
print(f"serving latency (N=2000 cache, 256 queries): {dt*1000:.2f} ms")
print(f"pred mean range: [{float(np.min(np.asarray(mean))):.2f}, "
      f"{float(np.max(np.asarray(mean))):.2f}]")
