"""Microbench: XLA native Cholesky vs Pallas blocked kernel on the TPU.

Honest timing per docs/PERFORMANCE.md: REPS evals inside one jitted
lax.scan with a per-iteration input perturbation; fresh seed per timed
call; min-of-3 minus measured dispatch latency.
"""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gpflow_slim_tpu.ops import pallas_cholesky

    Ns = [int(s) for s in os.environ.get("BENCH_NS", "4096,8192").split(",")]
    BSs = [int(s) for s in os.environ.get("BENCH_BS", "256,512").split(",")]
    reps = int(os.environ.get("BENCH_REPS", "10"))

    @jax.jit
    def trivial(x):
        return x + 1.0

    float(trivial(jnp.float32(0.0)))
    lat = min(
        (lambda t0: (float(trivial(jnp.float32(i + 2.0))), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for i in range(3)
    )

    for N in Ns:
        rng = np.random.RandomState(0)
        A = rng.randn(N, N).astype(np.float32) / np.sqrt(N)
        K = (A @ A.T + np.eye(N, dtype=np.float32) * 2.0)
        K = jnp.asarray(K)
        flops = N**3 / 3.0

        def scan_time(fn):
            @jax.jit
            def many(K, seed):
                def body(c, i):
                    Kp = K + (seed * 1e-6 + 1e-5 * (i + 1)) * jnp.eye(
                        N, dtype=K.dtype
                    )
                    L = fn(Kp)
                    return c + L[N - 1, N - 1], None

                tot, _ = jax.lax.scan(
                    body, jnp.zeros((), K.dtype), jnp.arange(reps)
                )
                return tot

            float(many(K, jnp.float32(0.0)))  # compile
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                float(many(K, jnp.float32(i + 1.0)))
                ts.append(time.perf_counter() - t0)
            return (min(ts) - lat) / reps

        t_xla = scan_time(jnp.linalg.cholesky)
        print(
            f"N={N} XLA     : {t_xla*1e3:8.2f} ms  {flops/t_xla/1e12:6.2f} TF/s",
            flush=True,
        )
        for bs in BSs:
            if N % bs:
                continue
            t_p = scan_time(
                lambda Kp, bs=bs: pallas_cholesky.cholesky(Kp, bs)
            )
            print(
                f"N={N} pallas{bs}: {t_p*1e3:8.2f} ms  {flops/t_p/1e12:6.2f} TF/s",
                flush=True,
            )


if __name__ == "__main__":
    sys.exit(main())
