"""Benchmark: exact-GPR marginal-likelihood evals/sec at N=10k (BASELINE #1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the reference math re-run as a numpy/scipy
f64 oracle on CPU (the reference publishes no numbers — BASELINE.md), i.e.
value / oracle_evals_per_sec.

Runs on whatever the default JAX backend is (the driver provides the real
TPU chip). f32 on TPU; the parity story is covered by the f64 CPU tests.
"""

import json
import os
import sys
import time

import numpy as np


def oracle_eval_rate(X, Y, variance, lengthscale, noise, reps=2):
    """Reference-math (numpy/scipy f64) marginal-likelihood eval rate."""
    from scipy.linalg import cho_factor, solve_triangular

    t0 = time.perf_counter()
    for _ in range(reps):
        Xs = X / lengthscale
        sq = (
            (Xs**2).sum(1)[:, None]
            - 2 * Xs @ Xs.T
            + (Xs**2).sum(1)[None, :]
        )
        K = variance * np.exp(-0.5 * np.maximum(sq, 0))
        K[np.diag_indices_from(K)] += noise
        L = np.linalg.cholesky(K)
        alpha = solve_triangular(L, Y, lower=True)
        _ = (
            -0.5 * X.shape[0] * np.log(2 * np.pi)
            - np.sum(np.log(np.diag(L)))
            - 0.5 * np.sum(alpha**2)
        )
    return reps / (time.perf_counter() - t0)


def main():
    N = int(os.environ.get("BENCH_N", 10_000))
    import jax

    import gpflow_slim_tpu as gfs

    rng = np.random.RandomState(0)
    X = rng.uniform(0, 1, (N, 1)).astype(np.float32)
    Y = (np.sin(12 * X) + 0.66 * np.cos(25 * X)
         + 0.1 * rng.randn(N, 1)).astype(np.float32)

    model = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.1))

    @jax.jit
    def objective(m):
        return m.objective()

    # compile + warm up
    objective(model).block_until_ready()

    reps = int(os.environ.get("BENCH_REPS", 10))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = objective(model)
    out.block_until_ready()
    evals_per_sec = reps / (time.perf_counter() - t0)

    base = oracle_eval_rate(
        X.astype(np.float64), Y.astype(np.float64), 1.0, 0.1, 1.0,
        reps=1 if N >= 10_000 else 3,
    )

    print(json.dumps({
        "metric": f"gpr_marglik_evals_per_sec_n{N}",
        "value": round(evals_per_sec, 3),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_sec / base, 2),
    }))


if __name__ == "__main__":
    main()
