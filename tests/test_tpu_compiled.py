"""Compiled-on-TPU validation of the Pallas performance paths.

The rest of the suite exercises Pallas kernels in interpret mode on CPU
(deterministic, hermetic); these tests compile and run the REAL Mosaic
kernels plus one sharded-loss step on the chip, so compiled-path
regressions are caught by pytest instead of only by benchmark scripts.

Run with:  GFS_TEST_TPU=1 python -m pytest tests/ -m tpu
(auto-skipped in the default CPU suite — see conftest.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend"
)


def _spd(n, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n).astype(dtype)
    return (A @ A.T / n + np.eye(n, dtype=dtype)).astype(dtype)


@requires_tpu
def test_pallas_cholesky_compiled_matches_xla():
    from gpflow_slim_tpu.ops import pallas_cholesky

    K = jnp.asarray(_spd(2048, seed=0))
    L_p = jax.jit(lambda k: pallas_cholesky.cholesky(k, 256))(K)
    L_x = jax.jit(lambda k: jnp.linalg.cholesky(k))(K)
    np.testing.assert_allclose(
        np.asarray(L_p), np.asarray(L_x), rtol=2e-4, atol=2e-4
    )


@requires_tpu
def test_pallas_cholesky_grad_compiled():
    from gpflow_slim_tpu.ops import pallas_cholesky

    K = jnp.asarray(_spd(512, seed=1))

    def f_p(k):
        return jnp.sum(jnp.log(jnp.diagonal(pallas_cholesky.cholesky(k, 256))))

    def f_x(k):
        return jnp.sum(jnp.log(jnp.diagonal(jnp.linalg.cholesky(k))))

    g_p = jax.jit(jax.grad(f_p))(K)
    g_x = jax.jit(jax.grad(f_x))(K)
    # XLA's VJP returns a lower-triangular-convention gradient; ours is the
    # symmetrized full-matrix convention — compare through symmetrization
    sym = lambda g: np.asarray(g + g.T) / 2.0
    np.testing.assert_allclose(sym(g_p), sym(g_x), rtol=1e-3, atol=1e-4)


@requires_tpu
def test_pallas_trsm_wide_compiled():
    from gpflow_slim_tpu.ops import pallas_trsm

    K = jnp.asarray(_spd(1024, seed=2))
    L = jnp.linalg.cholesky(K)
    B = jnp.asarray(np.random.RandomState(3).randn(1024, 256), jnp.float32)
    X_p = jax.jit(pallas_trsm.solve_lower)(L, B)
    X_x = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    np.testing.assert_allclose(
        np.asarray(X_p), np.asarray(X_x), rtol=2e-4, atol=2e-4
    )


@requires_tpu
def test_pallas_trsm_batched_compiled():
    from gpflow_slim_tpu.ops import pallas_trsm

    P, M, Kc = 4, 256, 256
    Ls = jnp.stack([jnp.linalg.cholesky(jnp.asarray(_spd(M, seed=10 + p)))
                    for p in range(P)])
    B = jnp.asarray(np.random.RandomState(4).randn(P, M, Kc), jnp.float32)
    X_p = jax.jit(pallas_trsm.batched_solve_lower)(Ls, B)
    X_x = jax.vmap(
        lambda l, b: jax.scipy.linalg.solve_triangular(l, b, lower=True)
    )(Ls, B)
    np.testing.assert_allclose(
        np.asarray(X_p), np.asarray(X_x), rtol=2e-4, atol=2e-4
    )


@requires_tpu
def test_pallas_gram_compiled():
    from gpflow_slim_tpu.ops import pallas_gram

    X = jnp.asarray(np.random.RandomState(5).rand(1024, 4), jnp.float32)
    Xs = X / 0.5
    K_p = jax.jit(
        lambda x: pallas_gram.stationary_gram("rbf", x, x, jnp.float32(1.3))
    )(Xs)
    # oracle matmul at HIGHEST: at TPU-default bf16 products the ORACLE
    # itself is off by ~3e-3 on the diagonal (the documented bf16-MXU
    # cancellation hazard) — the 2026-08-20 on-chip run failed on exactly
    # that, with the Pallas kernel being the correct side
    sq = (jnp.sum(Xs**2, 1)[:, None]
          - 2 * jnp.matmul(Xs, Xs.T, precision=jax.lax.Precision.HIGHEST)
          + jnp.sum(Xs**2, 1)[None, :])
    K_x = 1.3 * jnp.exp(-0.5 * jnp.maximum(sq, 0.0))
    np.testing.assert_allclose(
        np.asarray(K_p), np.asarray(K_x), rtol=1e-4, atol=1e-4
    )


@requires_tpu
def test_gram_lower_compiled_matches_full_on_lower():
    # non-multiple-of-tile N exercises the padded edge; lower triangle
    # must match the full fused gram bitwise (same tile computation)
    from gpflow_slim_tpu.ops import pallas_gram

    X = jnp.asarray(np.random.RandomState(7).rand(1000, 3), jnp.float32)
    Xs = X / 0.4
    K_l = jax.jit(
        lambda x: pallas_gram.stationary_gram_lower(
            "rbf", x, jnp.float32(0.8))
    )(Xs)
    K_f = jax.jit(
        lambda x: pallas_gram.stationary_gram("rbf", x, x, jnp.float32(0.8))
    )(Xs)
    il = np.tril_indices(1000)
    np.testing.assert_array_equal(np.asarray(K_l)[il], np.asarray(K_f)[il])


@requires_tpu
def test_gpr_objective_compiled_vs_f64_oracle():
    """One end-to-end GPR objective on the chip vs the numpy f64 oracle."""
    import gpflow_slim_tpu as gfs
    from scipy.linalg import solve_triangular

    N = 2048
    rng = np.random.RandomState(6)
    X = rng.uniform(0, 1, (N, 1)).astype(np.float32)
    Y = (np.sin(12 * X) + 0.1 * rng.randn(N, 1)).astype(np.float32)
    model = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.1))
    val = float(jax.jit(lambda m: m.objective())(model))

    Xd = X.astype(np.float64) / 0.1
    sq = (Xd**2).sum(1)[:, None] - 2 * Xd @ Xd.T + (Xd**2).sum(1)[None, :]
    Kd = np.exp(-0.5 * np.maximum(sq, 0)) + np.eye(N)
    Ld = np.linalg.cholesky(Kd)
    al = solve_triangular(Ld, Y.astype(np.float64), lower=True)
    oracle = -(-0.5 * N * np.log(2 * np.pi) - np.log(np.diag(Ld)).sum()
               - 0.5 * (al**2).sum())
    assert abs(val - oracle) / abs(oracle) < 5e-3


@requires_tpu
def test_distributed_loss_single_chip_mesh():
    """The sharded GPR loss compiles and runs on a 1×1 mesh on the chip."""
    import gpflow_slim_tpu as gfs
    from gpflow_slim_tpu import parallel
    from jax.sharding import Mesh

    N = 1024
    rng = np.random.RandomState(7)
    X = rng.uniform(0, 1, (N, 1)).astype(np.float32)
    Y = np.sin(6 * X).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
    model = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3))
    loss_fn = parallel.make_distributed_gpr_loss(model, mesh, block_size=256)
    v, g = jax.jit(jax.value_and_grad(loss_fn))(model)
    assert np.isfinite(float(v))
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(g))


@requires_tpu
def test_pallas_cholesky_ill_conditioned_gram():
    """Short-lengthscale RBF Gram (rank-deficient + 1e-2 jitter): the
    factorization must stay finite and f32-accurate ON HARDWARE.

    Regression for the 2026-08-20 NaN: the leaf rank-1 update ran as a
    K=1 MXU matmul at default precision (bf16 products); 64 accumulated
    O(2^-9) errors pushed later Schur pivots of exactly this matrix
    class negative. Interpret-mode tests can never catch it (CPU is
    always exact-f32) — this must run compiled.
    """
    from gpflow_slim_tpu.ops import pallas_cholesky

    N = 2048
    rng = np.random.RandomState(0)
    X = rng.uniform(0, 1, (N, 1))
    d = X / 0.1
    sq = (d**2).sum(1)[:, None] - 2 * d @ d.T + (d**2).sum(1)[None, :]
    Kd = np.exp(-0.5 * np.maximum(sq, 0)) + 1e-2 * np.eye(N)
    Ld = np.linalg.cholesky(Kd)
    K32 = jnp.asarray(Kd, jnp.float32)

    for bs in (256, 512):
        for mode in ("hi", "s3", "s4", "s4d", "s4x2"):
            L = np.asarray(
                jax.jit(lambda K, b=bs, s=mode: pallas_cholesky.cholesky(
                    K, b, s))(K32),
                np.float64,
            )
            assert np.all(np.isfinite(L)), (bs, mode)
            frob = (np.linalg.norm(np.tril(L) - Ld)
                    / np.linalg.norm(Ld))
            # f32-class: XLA's own f32 chol measures ~4e-5 here
            assert frob < 5e-4, (bs, mode, frob)


@requires_tpu
def test_fused_gram_chol_solve_logdet_compiled():
    """Round-5 fused pipeline end-to-end on the chip: one-pass lower-tile
    gram+noise+pad operand -> fused potrf+potrs (s4) vs the f64 oracle,
    at a non-block-multiple N (exercises the unit-diagonal pad path)."""
    from gpflow_slim_tpu.ops import pallas_cholesky, pallas_gram

    N, bs = 3000, 512
    pad_to = N + (-N) % bs
    rng = np.random.RandomState(0)
    X = rng.uniform(0, 1, (N, 1))
    Y = np.sin(12 * X) + 0.1 * rng.randn(N, 1)

    Xs = jnp.asarray(X / 0.1, jnp.float32)
    D = jnp.asarray(Y, jnp.float32)
    Dp = jnp.concatenate(
        [D, jnp.zeros((pad_to - N, 1), jnp.float32)], axis=0)

    @jax.jit
    def pipeline(Xs, Dp):
        Kp = pallas_gram.stationary_gram_chol_operand(
            "rbf", Xs, jnp.float32(1.0), jnp.float32(0.01), pad_to)
        return pallas_cholesky.cholesky_solve_logdet(Kp, Dp, bs, "s4")

    hl, quad = pipeline(Xs, Dp)

    # f64 oracle factoring the DEVICE-COMPUTED gram (pull the valid lower
    # triangle): this isolates the factorization+solve accuracy the fused
    # kernel owns. Comparing against a host-built f64 gram instead mixes
    # in f32 gram-ENTRY rounding, which at noise=0.01 conditioning is
    # ~1e-5 of the logdet (the round-4 "oracle artifact" lesson).
    Kp_dev = jax.jit(
        lambda Xs: pallas_gram.stationary_gram_chol_operand(
            "rbf", Xs, jnp.float32(1.0), jnp.float32(0.01), pad_to)
    )(Xs)
    Kl = np.asarray(Kp_dev[:N, :N], np.float64)
    Kd = np.tril(Kl) + np.tril(Kl, -1).T  # symmetrize from the lower
    Ld = np.linalg.cholesky(Kd)
    from scipy.linalg import solve_triangular
    al = solve_triangular(Ld, np.asarray(D, np.float64), lower=True)
    hl_ref = np.log(np.diag(Ld)).sum()
    quad_ref = (al**2).sum()

    assert abs(float(hl) - hl_ref) / abs(hl_ref) < 5e-6, (
        float(hl), hl_ref)
    assert abs(float(quad) - quad_ref) / abs(quad_ref) < 5e-5, (
        float(quad), quad_ref)
