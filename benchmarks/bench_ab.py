"""Same-session Pallas on/off A/B at the headline shape (VERDICT r3 #1).

The tunnel drifts +-30% between sessions, so only same-process pairs are
evidence. Times, at N (default 10000, the driver's headline shape):

  - full GPR objective, use_pallas=True vs False
  - gram alone: pallas vs XLA composite
  - cholesky alone: pallas bs=512 / bs=256 vs XLA
  - the same at the padded-free size Np (next multiple of 512) to isolate
    the cost of pad-copies from the kernels themselves

Usage: python benchmarks/bench_ab.py [--n 10000] [--reps 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_rate(leaves, treedef, reps=20):
    """evals/s from one on-device lax.scan (mirrors bench.py timing)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(leaves, seed):
        def body(carry, i):
            pert = [
                l + seed * 1e-7 + 1e-6 * (i + 1) if l.ndim == 0 else l
                for l in leaves
            ]
            m = jax.tree_util.tree_unflatten(treedef, pert)
            return carry + m.objective(), None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(reps))
        return total

    float(many(leaves, jnp.float32(0.0)))  # compile
    best = float("inf")
    for t in range(3):
        t0 = time.perf_counter()
        float(many(leaves, jnp.float32(17.0 + 7 * t)))
        best = min(best, time.perf_counter() - t0)
    return reps / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--skip-full", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import gpflow_slim_tpu as gfs
    from gpflow_slim_tpu import config
    from gpflow_slim_tpu.ops import pallas_cholesky, pallas_gram

    N = args.n
    rng = np.random.RandomState(0)
    X = rng.uniform(0, 1, (N, 1)).astype(np.float32)
    Y = (np.sin(12 * X) + 0.66 * np.cos(25 * X)
         + 0.1 * rng.randn(N, 1)).astype(np.float32)

    results = {}

    # ---- full objective A/B ----------------------------------------
    if not args.skip_full:
        for flag in (True, False):
            config.set_settings(
                __import__("dataclasses").replace(
                    config.settings(), use_pallas=flag))
            model = gfs.models.GPR(
                X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.1))
            leaves, treedef = jax.tree_util.tree_flatten(model)
            rate = scan_rate(leaves, treedef, reps=args.reps)
            results[f"objective_evals_per_s_pallas_{flag}"] = round(rate, 2)
            print(f"objective use_pallas={flag}: {rate:.2f} evals/s",
                  flush=True)
        config.set_settings(__import__("dataclasses").replace(
            config.settings(), use_pallas=True))

    # ---- component timings at N and padded-free Np ------------------
    for size in (N, ((N + 511) // 512) * 512):
        Xs = jnp.asarray(rng.uniform(0, 1, (size, 1)).astype(np.float32)) / 0.1
        var = jnp.float32(1.0)

        gram_p = jax.jit(lambda a, v: pallas_gram.stationary_gram(
            "rbf", a, a, v))
        gram_x = jax.jit(lambda a, v: pallas_gram._gram_reference(
            "rbf", a, a, v))
        for name, fn in (("gram_pallas", gram_p), ("gram_xla", gram_x)):
            out = fn(Xs, var)
            out.block_until_ready()
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                fn(Xs, var).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            results[f"{name}_n{size}_ms"] = round(best * 1e3, 2)
            print(f"{name} N={size}: {best*1e3:.2f} ms", flush=True)

        K = gram_x(Xs, var) + 1.0 * jnp.eye(size, dtype=jnp.float32)
        K.block_until_ready()

        chol_x = jax.jit(lambda k: jnp.linalg.cholesky(k))
        entries = [("chol_xla", chol_x)]
        for bs in (256, 512):
            try:
                fn = jax.jit(lambda k, b=bs: pallas_cholesky.cholesky(k, b))
                fn.lower(jax.ShapeDtypeStruct((size, size),
                                              jnp.float32)).compile()
                entries.append((f"chol_pallas_bs{bs}", fn))
            except Exception as e:
                print(f"chol_pallas bs={bs} N={size}: compile REJECTED "
                      f"({type(e).__name__})", flush=True)
        for name, fn in entries:
            out = fn(K)
            out.block_until_ready()
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                fn(K).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            results[f"{name}_n{size}_ms"] = round(best * 1e3, 2)
            print(f"{name} N={size}: {best*1e3:.2f} ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
