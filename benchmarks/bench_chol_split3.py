"""Speed + accuracy of the 3-pass (split-bf16) trailing SYRK vs the
6-pass HIGHEST Pallas Cholesky and XLA, on a REAL RBF Gram (short
lengthscale — the cancellation-stress case), scan-amortized fresh-seed
timing. Run on the TPU chip; results recorded in docs/PERFORMANCE.md.
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

    sizes = [int(s) for s in os.environ.get(
        "BENCH_SIZES", "8192,10240").split(",")]
    reps = int(os.environ.get("BENCH_REPS", 8))

    for N in sizes:
        rng = np.random.RandomState(0)
        X = rng.uniform(0, 1, (N, 1))
        # f64 Gram oracle at lengthscale 0.1, noise 1e-2 (exact-GPR floor)
        d = X / 0.1
        sq = (d**2).sum(1)[:, None] - 2 * d @ d.T + (d**2).sum(1)[None, :]
        Kd = np.exp(-0.5 * np.maximum(sq, 0)) + 1e-2 * np.eye(N)
        Ld = np.linalg.cholesky(Kd)
        logdet_d = 2.0 * np.log(np.diag(Ld)).sum()
        K32 = jnp.asarray(Kd, jnp.float32)

        def make(name):
            if name == "xla":
                return jax.jit(jnp.linalg.cholesky)
            import re

            m = re.fullmatch(r"p(\d+)((?:hi|s3d|s4d|s3|s4)(?:x2)?)?", name)
            bs, mode = int(m.group(1)), m.group(2) or "hi"
            return jax.jit(
                lambda K: pallas_cholesky.cholesky(K, bs, mode))

        impls = {
            name: make(name)
            for name in os.environ.get(
                "BENCH_IMPLS", "xla,p512,p512s3").split(",")
        }

        # residual denominator once (on device — the tunnel hangs on
        # multi-hundred-MB device->host pulls, so accuracy is measured
        # from the pulled DIAGONAL (40 KB) + a device-side reconstruction
        # residual, never by pulling the whole factor)
        @jax.jit
        def recon_rel(L, K):
            Lt = jnp.tril(L)
            R = jax.lax.dot_general(
                Lt, Lt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST) - K
            return jnp.linalg.norm(R) / jnp.linalg.norm(K)

        for name, impl in impls.items():
            # accuracy on the real Gram
            L = impl(K32)
            diag = np.asarray(jnp.diagonal(L), np.float64)
            logdet = 2.0 * np.log(diag).sum()
            frob = float(recon_rel(L, K32))  # ‖LLᵀ−K‖/‖K‖ (f32 device)
            ld_rel = abs(logdet - logdet_d) / abs(logdet_d)

            # scan-amortized fresh-seed timing
            @jax.jit
            def many(K, seed, impl=impl):
                def body(carry, i):
                    Lc = impl(K + (seed * 1e-9 + 1e-8 * (i + 1))
                              * jnp.eye(N, dtype=K.dtype))
                    return carry + jnp.sum(Lc[-1, -128:]), None

                total, _ = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32), jnp.arange(reps))
                return total

            float(many(K32, jnp.float32(5.0)))
            best = float("inf")
            for t in range(3):
                t0 = time.perf_counter()
                float(many(K32, jnp.float32(11.0 + 3 * t)))
                best = min(best, time.perf_counter() - t0)
            ms = best * 1e3 / reps
            tfs = (N**3 / 3) / (ms * 1e-3) / 1e12
            print(json.dumps({
                "impl": name, "N": N, "ms": round(ms, 2),
                "tf_s": round(tfs, 2),
                "recon_rel": float(f"{frob:.3e}"),
                "logdet_rel": float(f"{ld_rel:.3e}"),
            }), flush=True)


if __name__ == "__main__":
    main()
