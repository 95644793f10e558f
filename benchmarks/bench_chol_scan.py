"""Scan-based Cholesky throughput: Pallas vs XLA across N (VERDICT r3 #1).

The remote runtime memoizes repeat executions and its dispatch latency is
~20 ms — single-dispatch timings (bench_ab.py's component section) are
dominated by both. This benchmark times R factorizations inside ONE
``lax.scan`` whose body perturbs the diagonal each iteration (defeats
memoization; amortizes dispatch), min-of-3 fresh-seed calls — the same
honest-timing recipe as bench.py.

Prints one JSON line per (N, impl) and a final summary of the measured
winner per N — the data behind ops/linalg's routing table.

Usage: python benchmarks/bench_chol_scan.py [--sizes 4096,8192,10000]
       [--reps 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2048,4096,6144,8192,10000,12288")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--gram", action="store_true",
                    help="also time the fused gram kernel vs XLA composite")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    reps = args.reps

    import jax
    import jax.numpy as jnp

    from gpflow_slim_tpu.ops import pallas_cholesky, pallas_gram

    results = {}

    def scan_time(make_step, x0):
        """min-of-3 seconds for `reps` executions of make_step inside one
        jitted scan; returns per-execution seconds."""

        @jax.jit
        def many(x, seed):
            def body(carry, i):
                out = make_step(x, seed + 1e-6 * (i + 1))
                # fold a scalar of the output into the carry so nothing is
                # dead-code eliminated
                return carry + out, None

            total, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return total

        float(many(x0, jnp.float32(0.0)))  # compile + warm
        best = float("inf")
        for t in range(3):
            t0 = time.perf_counter()
            float(many(x0, jnp.float32(13.0 + 3 * t)))
            best = min(best, time.perf_counter() - t0)
        return best / reps

    for N in sizes:
        rng = np.random.RandomState(0)
        X = (rng.uniform(0, 1, (N, 1)) / 0.1).astype(np.float32)
        Xd = jnp.asarray(X)
        var = jnp.float32(1.0)
        K0 = jax.jit(
            lambda a, v: pallas_gram._gram_reference("rbf", a, a, v)
        )(Xd, var) + 1.0 * jnp.eye(N, dtype=jnp.float32)
        K0.block_until_ready()

        flops = N**3 / 3.0

        def xla_step(K, eps):
            L = jnp.linalg.cholesky(K + eps * jnp.eye(N, dtype=K.dtype))
            return jnp.sum(L[-1, -128:])

        entries = [("xla", xla_step)]
        for bs in (256, 512):
            try:
                jax.jit(
                    lambda k, b=bs: pallas_cholesky.cholesky(k, b)
                ).lower(jax.ShapeDtypeStruct((N, N), jnp.float32)).compile()
            except Exception as e:
                print(f"# chol pallas bs={bs} N={N}: compile REJECTED "
                      f"({type(e).__name__})", flush=True)
                continue

            def pallas_step(K, eps, b=bs):
                L = pallas_cholesky.cholesky(
                    K + eps * jnp.eye(N, dtype=K.dtype), b)
                return jnp.sum(L[-1, -128:])

            entries.append((f"pallas{bs}", pallas_step))

        for name, step in entries:
            sec = scan_time(step, K0)
            key = f"chol_{name}_n{N}"
            results[key] = round(sec * 1e3, 3)
            print(f"chol {name:9s} N={N}: {sec*1e3:8.2f} ms  "
                  f"({flops/sec/1e12:6.2f} TF/s)", flush=True)

        if args.gram:
            def gram_p(X, eps):
                K = pallas_gram.stationary_gram("rbf", X + eps, X + eps, var)
                return jnp.sum(K[-1, -128:])

            def gram_x(X, eps):
                K = pallas_gram._gram_reference("rbf", X + eps, X + eps, var)
                return jnp.sum(K[-1, -128:])

            def gram_l(X, eps):
                K = pallas_gram.stationary_gram_lower("rbf", X + eps, var)
                return jnp.sum(K[-1, -128:])

            for name, step in (("pallas", gram_p), ("xla", gram_x),
                               ("lower", gram_l)):
                sec = scan_time(step, Xd)
                results[f"gram_{name}_n{N}"] = round(sec * 1e3, 3)
                print(f"gram {name:9s} N={N}: {sec*1e3:8.2f} ms", flush=True)

    # winner table
    for N in sizes:
        cands = {k: v for k, v in results.items()
                 if k.startswith("chol_") and k.endswith(f"_n{N}")}
        if cands:
            win = min(cands, key=cands.get)
            print(f"# winner N={N}: {win} ({cands[win]} ms)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
