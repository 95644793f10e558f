"""Measured TRSM crossovers: Pallas vs XLA (VERDICT r3 #7).

Two routing gates in ``ops/linalg.py`` were asserted, never measured:

  * wide-RHS: ``B.shape[1] >= 128`` sends (M, N) solves to the Pallas
    blocked TRSM — the SGPR/SVGP big-test-batch prediction shape;
  * batched: ``M <= 1024`` sends (P, M, M) triangle batches to the Pallas
    grid kernel — the q_sqrt / per-output shapes of gauss_kl.

This measures both against XLA at the real shapes with the
memoization-proof scan recipe (per-iteration perturbation, min-of-3
fresh-seed calls) and prints a winner per shape.

Usage: python benchmarks/bench_trsm_scan.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    from gpflow_slim_tpu.ops import pallas_trsm

    reps = 12
    results = {}

    def scan_time(step, x0):
        @jax.jit
        def many(x, seed):
            def body(carry, i):
                out = step(x, seed * 1e-6 + 1e-5 * (i + 1))
                return carry + out, None

            total, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return total

        float(many(x0, jnp.float32(0.0)))
        best = float("inf")
        for t in range(3):
            t0 = time.perf_counter()
            float(many(x0, jnp.float32(7.0 + 3 * t)))
            best = min(best, time.perf_counter() - t0)
        return best / reps

    rng = np.random.RandomState(0)

    # ---- wide RHS: (M, M) lower triangle, (M, N) RHS --------------------
    for M, N in [(512, 2048), (512, 16384), (1024, 8192),
                 (2048, 2048), (2048, 16384)]:
        A = rng.randn(M, M).astype(np.float32)
        L0 = jnp.asarray(np.tril(A) + M * np.eye(M, dtype=np.float32))
        B0 = jnp.asarray(rng.randn(M, N).astype(np.float32))

        def xla_step(args, eps):
            L, B = args
            X = solve_triangular(L, B + eps, lower=True)
            return jnp.sum(X[-1, -128:])

        def pallas_step(args, eps):
            L, B = args
            X = pallas_trsm.solve_lower(L, B + eps)
            return jnp.sum(X[-1, -128:])

        for name, step in (("xla", xla_step), ("pallas", pallas_step)):
            try:
                sec = scan_time(step, (L0, B0))
            except Exception as e:
                print(f"# wide {name} M={M} N={N}: FAILED "
                      f"({type(e).__name__})", flush=True)
                continue
            results[f"wide_{name}_m{M}_n{N}"] = round(sec * 1e3, 3)
            print(f"wide {name:7s} M={M:5d} N={N:6d}: {sec*1e3:8.2f} ms",
                  flush=True)

    # ---- batched: (P, M, M) triangles, (P, M, M) RHS (gauss_kl shape) ---
    for P, M in [(4, 256), (4, 512), (10, 512), (4, 1024), (2, 2048)]:
        A = rng.randn(P, M, M).astype(np.float32)
        L0 = jnp.asarray(np.tril(A) + M * np.eye(M, dtype=np.float32))
        B0 = jnp.asarray(rng.randn(P, M, M).astype(np.float32))

        def xla_step(args, eps):
            L, B = args
            X = jax.vmap(
                lambda l, b: solve_triangular(l, b, lower=True))(L, B + eps)
            return jnp.sum(X[-1, -1, -128:])

        def pallas_step(args, eps):
            L, B = args
            X = pallas_trsm.batched_solve_lower(L, B + eps)
            return jnp.sum(X[-1, -1, -128:])

        for name, step in (("xla", xla_step), ("pallas", pallas_step)):
            try:
                sec = scan_time(step, (L0, B0))
            except Exception as e:
                print(f"# batched {name} P={P} M={M}: FAILED "
                      f"({type(e).__name__})", flush=True)
                continue
            results[f"batched_{name}_p{P}_m{M}"] = round(sec * 1e3, 3)
            print(f"batched {name:7s} P={P:3d} M={M:5d}: {sec*1e3:8.2f} ms",
                  flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
