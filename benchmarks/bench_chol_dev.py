"""Fast kernel-iteration timing: XLA vs Pallas Cholesky variants on a
synthetic SPD matrix (dense-Cholesky timing is data-independent), scan-
amortized fresh-seed min-of-3. No f64 oracle — accuracy is measured by
benchmarks/bench_chol_split3.py on a real Gram; this script exists so a
kernel edit can be timed on-chip in ~1 min instead of ~10.

  BENCH_N=10240 BENCH_REPS=8 BENCH_IMPLS=xla,p512,p1024,p512s3 \
      python benchmarks/bench_chol_dev.py
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

    from gpflow_slim_tpu.ops import pallas_cholesky

    N = int(os.environ.get("BENCH_N", 10240))
    reps = int(os.environ.get("BENCH_REPS", 8))
    which = os.environ.get("BENCH_IMPLS", "xla,p512,p1024").split(",")

    def make(name):
        if name == "xla":
            return jax.jit(jnp.linalg.cholesky)
        import re

        m = re.fullmatch(r"p(\d+)((?:hi|s3d|s4d|s3|s4)(?:x2)?)?", name)
        bs, mode = int(m.group(1)), m.group(2) or "hi"
        return jax.jit(lambda K: pallas_cholesky.cholesky(K, bs, mode))

    K0 = 2.0 * jnp.eye(N, dtype=jnp.float32)
    for name in which:
        impl = make(name)

        @jax.jit
        def many(K, seed, impl=impl):
            def body(carry, i):
                L = impl(K + (seed * 1e-9 + 1e-8 * (i + 1))
                         * jnp.eye(N, dtype=K.dtype))
                return carry + jnp.sum(L[-1, -128:]), None

            total, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return total

        try:
            float(many(K0, jnp.float32(5.0)))
        except Exception as e:
            print(json.dumps({"impl": name, "N": N,
                              "error": f"{type(e).__name__}: {e}"[:200]}))
            continue
        best = float("inf")
        for t in range(3):
            t0 = time.perf_counter()
            float(many(K0, jnp.float32(11.0 + 3 * t)))
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / reps
        tfs = (N**3 / 3) / (ms * 1e-3) / 1e12
        print(json.dumps({"impl": name, "N": N, "ms": round(ms, 2),
                          "tf_s": round(tfs, 2)}), flush=True)


if __name__ == "__main__":
    main()
