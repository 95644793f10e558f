"""Distributed exact GPR: ring Gram + sharded blocked Cholesky over a
device mesh (BASELINE config #5 shape). On a single host this runs over
the virtual CPU mesh; on a pod slice the same code spans real chips.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/04_distributed_gpr.py
"""

import jax
import numpy as np

import os

FAST = os.environ.get("GFS_EXAMPLE_FAST") == "1"  # tiny sizes for tests/test_examples.py smoke runs

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu import parallel

n_dev = len(jax.devices())
mesh = parallel.make_mesh({"rows": n_dev})
print(f"mesh: {n_dev} devices on axis 'rows'")

rng = np.random.RandomState(0)
N = 512 if FAST else 1024  # scale to 50k+ on real hardware
X = rng.uniform(0, 1, (N, 1)).astype(np.float32)
Y = (np.sin(12 * X) + 0.1 * rng.randn(N, 1)).astype(np.float32)

m = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.1))
loss_fn = parallel.make_distributed_gpr_loss(m, mesh, axis="rows",
                                             block_size=64 if FAST else 128)

value_and_grad = jax.jit(jax.value_and_grad(loss_fn))
loss, grads = value_and_grad(m)
print(f"distributed -log p(Y) = {float(loss):.2f}")
print("matches single-device:",
      abs(float(loss) - float(m.objective())) < 1e-2)
