"""Pallas-kernel vs XLA-op equivalence (SURVEY §4 new test class).

On CPU the kernels run in interpreter mode — same kernel code, same DMAs,
same control flow as the compiled TPU path, minus Mosaic lowering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu.ops import pallas_cholesky, pallas_gram, pallas_trsm

rng = np.random.RandomState(0)


def spd(N, dtype=np.float32):
    A = rng.randn(N, N).astype(dtype)
    return A @ A.T + N * np.eye(N, dtype=dtype)


@pytest.mark.parametrize("kind", ["rbf", "matern12", "matern32", "matern52",
                                  "exponential"])
def test_gram_kernel_matches_reference(kind):
    X = jnp.asarray(rng.randn(200, 3), jnp.float32)
    Y = jnp.asarray(rng.randn(130, 3), jnp.float32)
    out = pallas_gram.gram_interpret_mode(kind, X, Y, 1.3)
    ref = pallas_gram._gram_reference(kind, X, Y, jnp.float32(1.3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("kind", ["rbf", "matern32"])
def test_gram_lower_matches_reference_on_lower(kind):
    # tile-grid lower-only gram: lower triangle equals the full Gram,
    # strictly-upper TILES are zero (within-diagonal-tile upper entries
    # are unspecified-but-computed; consumers read lower only)
    X = jnp.asarray(rng.randn(300, 2), jnp.float32)
    out = pallas_gram._gram_lower_pallas(
        kind, X, jnp.float32(1.3), tile=128, interpret=True)
    ref = pallas_gram._gram_reference(kind, X, X, jnp.float32(1.3))
    il = np.tril_indices(300)
    np.testing.assert_allclose(
        np.asarray(out)[il], np.asarray(ref)[il], atol=2e-6)
    # strictly-upper tiles (row tile < col tile) must be zeroed
    assert np.all(np.asarray(out)[:128, 128:] == 0.0)


def test_gram_lower_vjp_matches_full_on_lower_cotangent():
    # cotangents from a lower-reading consumer are supported on the lower
    # triangle; stationary_gram_lower's registered bwd must equal the
    # full composite's VJP there (its forward equals the full Gram on the
    # lower triangle, so this is the exactness condition)
    X = jnp.asarray(rng.randn(40, 2), jnp.float32)
    var = jnp.float32(0.9)
    g = jnp.asarray(np.tril(rng.randn(40, 40)), jnp.float32)

    dX_l, dv_l = pallas_gram._lower_bwd("rbf", (X, var), g)

    _, vjp = jax.vjp(
        lambda x, v: pallas_gram._gram_reference("rbf", x, x, v), X, var)
    dX_f, dv_f = vjp(g)
    np.testing.assert_allclose(np.asarray(dX_l), np.asarray(dX_f),
                               atol=1e-6)
    np.testing.assert_allclose(float(dv_l), float(dv_f), rtol=1e-6)


def test_kernel_k_lower_fallback_matches_k():
    # on CPU (pallas inactive) K_lower must be exactly K for every kernel
    X = rng.randn(30, 2)
    for k in (gfs.kernels.RBF(2, lengthscales=0.4),
              gfs.kernels.Matern32(2),
              gfs.kernels.RBF(2) + gfs.kernels.White(2),
              gfs.kernels.Linear(2)):
        np.testing.assert_array_equal(
            np.asarray(k.K_lower(jnp.asarray(X))),
            np.asarray(k.K(jnp.asarray(X))))


def test_gram_matches_kernel_class_math():
    # the jnp composite must match kernels.RBF exactly (same formula)
    X = rng.randn(50, 2)
    k = gfs.kernels.RBF(2, variance=1.7, lengthscales=0.6)
    Xs = X / 0.6
    ref = pallas_gram._gram_reference(
        "rbf", jnp.asarray(Xs), jnp.asarray(Xs), jnp.asarray(1.7)
    )
    np.testing.assert_allclose(
        np.asarray(k.K(jnp.asarray(X))), np.asarray(ref), rtol=1e-10
    )


@pytest.mark.parametrize("N,bs", [(64, 64), (128, 64), (200, 64), (256, 128)])
def test_pallas_cholesky_matches_numpy(N, bs):
    K = spd(N)
    L = np.asarray(pallas_cholesky.cholesky_interpret(jnp.asarray(K),
                                                      block_size=bs))
    Lref = np.linalg.cholesky(K.astype(np.float64))
    assert np.abs(L - Lref).max() / np.abs(Lref).max() < 1e-5
    assert np.abs(np.triu(L, 1)).max() == 0.0


def test_pallas_cholesky_vjp_matches_xla():
    N = 48
    K = jnp.asarray(spd(N, np.float64))

    def f_pallas(K):
        L = pallas_cholesky.cholesky_interpret(K, block_size=16)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L * 0.01)

    # custom_vjp is attached to `cholesky`, which calls the compiled path;
    # emulate by differentiating the interpret forward through the same vjp
    L = pallas_cholesky.cholesky_interpret(K, block_size=16)
    g = jnp.tril(0.01 * jnp.ones_like(L)) + jnp.diag(1.0 / jnp.diagonal(L))
    (dK_pallas,) = pallas_cholesky._chol_vjp_bwd(L, g)

    def f_xla(K):
        L = jax.scipy.linalg.cholesky(K, lower=True)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(
            jnp.tril(L) * 0.01
        )

    dK_xla = jax.grad(f_xla)(K)
    s1 = 0.5 * (dK_pallas + dK_pallas.T)
    s2 = 0.5 * (dK_xla + dK_xla.T)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-8)


@pytest.mark.parametrize("N,P", [(128, 64), (200, 7), (64, 130)])
def test_pallas_trsm_matches_numpy(N, P):
    A = rng.randn(N, N).astype(np.float32)
    L = np.tril(A) + N * np.eye(N, dtype=np.float32)
    B = rng.randn(N, P).astype(np.float32)
    X1 = np.asarray(pallas_trsm.solve_lower_interpret(jnp.asarray(L),
                                                      jnp.asarray(B)))
    np.testing.assert_allclose(X1, np.linalg.solve(L.astype(np.float64), B),
                               atol=1e-6)
    X2 = np.asarray(pallas_trsm.solve_upper_interpret(jnp.asarray(L.T),
                                                      jnp.asarray(B)))
    np.testing.assert_allclose(X2, np.linalg.solve(L.T.astype(np.float64), B),
                               atol=1e-6)


def test_trsm_vector_rhs():
    N = 64
    A = rng.randn(N, N).astype(np.float32)
    L = np.tril(A) + N * np.eye(N, dtype=np.float32)
    b = rng.randn(N).astype(np.float32)
    x = np.asarray(pallas_trsm.solve_lower_interpret(jnp.asarray(L),
                                                     jnp.asarray(b)))
    assert x.shape == (N,)
    np.testing.assert_allclose(x, np.linalg.solve(L.astype(np.float64), b),
                               atol=1e-6)


def test_use_pallas_flag_routing_cpu_noop():
    # on CPU the flag must leave the stock XLA path active (no crash)
    X = rng.randn(30, 1)
    Y = rng.randn(30, 1)
    with gfs.temp_settings(use_pallas=True):
        m = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1))
        v = float(m.objective())
    m2 = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1))
    assert abs(v - float(m2.objective())) < 1e-10


def test_batched_trsm_matches_vmapped_xla():
    """Batched (P, M, M) solves — the q_sqrt / per-output variational
    pattern (VERDICT round-1 gap #3). Interpret mode on CPU; compiled
    coverage in tests/test_tpu_compiled.py."""
    P, M, K = 3, 96, 40  # M, K deliberately off the 128 tile
    Ls, Bs = [], []
    for p in range(P):
        A = rng.randn(M, M).astype(np.float32)
        Ls.append(np.tril(A) + M * np.eye(M, dtype=np.float32))
        Bs.append(rng.randn(M, K).astype(np.float32))
    L = jnp.asarray(np.stack(Ls))
    B = jnp.asarray(np.stack(Bs))

    X = np.asarray(pallas_trsm.batched_solve_lower_interpret(L, B))
    ref = np.stack([
        np.linalg.solve(l.astype(np.float64), b) for l, b in zip(Ls, Bs)
    ])
    np.testing.assert_allclose(X, ref, atol=2e-5)

    U = jnp.swapaxes(L, 1, 2)
    Xu = np.asarray(pallas_trsm.batched_solve_upper_interpret(U, B))
    refu = np.stack([
        np.linalg.solve(l.T.astype(np.float64), b) for l, b in zip(Ls, Bs)
    ])
    np.testing.assert_allclose(Xu, refu, atol=2e-5)


def test_batched_trsm_vjp_matches_xla():
    P, M, K = 2, 64, 8
    Ls = np.stack([
        np.tril(rng.randn(M, M)).astype(np.float32)
        + M * np.eye(M, dtype=np.float32)
        for _ in range(P)
    ])
    Bs = rng.randn(P, M, K).astype(np.float32)

    def ref_fn(L, B):
        sol = jax.vmap(
            lambda l, b: jax.scipy.linalg.solve_triangular(l, b, lower=True)
        )(L, B)
        return jnp.sum(jnp.sin(sol))

    L, B = jnp.asarray(Ls), jnp.asarray(Bs)
    gref_L, gref_B = jax.grad(ref_fn, argnums=(0, 1))(L, B)

    # the custom-VJP adjoint formula (dB = L⁻ᵀ g, dL = −tril(dB Xᵀ)),
    # evaluated through the interpret-mode kernels on CPU
    from gpflow_slim_tpu.ops.pallas_trsm import (
        _batched_trsm_pallas,
    )
    X = _batched_trsm_pallas(L, B, lower=True, interpret=True)
    g = jnp.cos(X)  # d/dX of sum(sin(X))
    dB = _batched_trsm_pallas(jnp.swapaxes(L, 1, 2), g, lower=False,
                              interpret=True)
    dL = -jnp.tril(jnp.einsum("pik,pjk->pij", dB, X))
    np.testing.assert_allclose(np.asarray(dL), np.asarray(gref_L),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(dB), np.asarray(gref_B),
                               atol=2e-4)


def test_linalg_batched_routing_cpu():
    from gpflow_slim_tpu.ops import linalg
    P, M, K = 2, 32, 4
    Ls = np.stack([
        np.tril(rng.randn(M, M)) + M * np.eye(M) for _ in range(P)
    ])
    Bs = rng.randn(P, M, K)
    out = np.asarray(linalg.batched_cho_solve_lower(jnp.asarray(Ls),
                                                    jnp.asarray(Bs)))
    ref = np.stack([
        np.linalg.solve(l @ l.T, b) for l, b in zip(Ls, Bs)
    ])
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)


def test_autotune_env_pin_parsing(monkeypatch):
    from gpflow_slim_tpu.ops import autotune
    monkeypatch.setenv("GFS_PALLAS_CHOL_BS", "512s3")
    assert autotune.chol_choice(4096, jnp.float32) == (512, "s3")
    monkeypatch.setenv("GFS_PALLAS_CHOL_BS", "256")
    assert autotune.chol_choice(4096, jnp.float32) == (256, "hi")
    monkeypatch.setenv("GFS_PALLAS_CHOL_BS", "512s4d")
    assert autotune.chol_choice(4096, jnp.float32) == (512, "s4d")
    monkeypatch.setenv("GFS_PALLAS_CHOL_BS", "0")
    assert autotune.chol_choice(4096, jnp.float32) is None
    # a malformed pin must fall through (to the static table on CPU with
    # GFS_AUTOTUNE=0 -> XLA), not raise
    monkeypatch.setenv("GFS_PALLAS_CHOL_BS", "s3")
    monkeypatch.setenv("GFS_AUTOTUNE", "0")
    assert autotune.chol_choice(4096, jnp.float32) is None


def test_vmem_cholesky_inv_doubling():
    # the blocked tile factor + doubling-assembled inverse (the panel-step
    # serial path of the compiled kernel) — pure jnp, runs anywhere
    for bs in (64, 128, 256):
        K = jnp.asarray(spd(bs), jnp.float64)
        L, Z = pallas_cholesky._vmem_cholesky_inv(K)
        Lref = np.linalg.cholesky(np.asarray(K))
        np.testing.assert_allclose(np.asarray(L), Lref, rtol=0, atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(Z @ L), np.eye(bs), atol=1e-8)
        assert np.abs(np.triu(np.asarray(Z), 1)).max() == 0.0


@pytest.mark.parametrize("syrk", ["s3", "s4", "s3d", "s4d"])
def test_pallas_cholesky_syrk_modes_interpret(syrk):
    # exercises the split-bf16 SYRK variants AND the peeled-diagonal DMA
    # choreography ("d" modes) through the same kernel code the TPU runs
    N = 200
    K = spd(N)
    L = np.asarray(pallas_cholesky.cholesky_interpret(
        jnp.asarray(K), block_size=64, syrk=syrk))
    Lref = np.linalg.cholesky(K.astype(np.float64))
    # split modes carry ~2^-15-class product error by design
    assert np.abs(L - Lref).max() / np.abs(Lref).max() < 2e-3
    assert np.abs(np.triu(L, 1)).max() == 0.0


def test_cholesky_solve_logdet_interpret_and_vjp():
    # fused potrf+potrs (+logdet) values AND custom-VJP gradients vs the
    # autodiff reference, through the same kernel code the TPU runs
    from scipy.linalg import solve_triangular

    N, P, bs = 128, 2, 64
    A = rng.randn(N, N)
    K0 = jnp.asarray(A @ A.T + N * np.eye(N))
    D0 = jnp.asarray(rng.randn(N, P))

    Lp, alpha, hld = pallas_cholesky._cholesky_solve_pallas(
        K0, D0, block_size=bs, interpret=True)
    L = np.linalg.cholesky(np.asarray(K0))
    al = solve_triangular(L, np.asarray(D0), lower=True)
    assert abs(float(hld) - np.log(np.diag(L)).sum()) < 1e-10 * abs(
        np.log(np.diag(L)).sum())
    np.testing.assert_allclose(np.asarray(alpha), al, atol=1e-8)

    def obj_ref(K, D, g1, g2):
        Lr = jnp.linalg.cholesky(K)
        hl = jnp.sum(jnp.log(jnp.diagonal(Lr)))
        a = jax.scipy.linalg.solve_triangular(Lr, D, lower=True)
        return g1 * hl + g2 * jnp.sum(jnp.square(a))

    g1, g2 = 0.7, -1.3
    gK_ref, gD_ref = jax.grad(obj_ref, argnums=(0, 1))(K0, D0, g1, g2)
    Kbar, Dbar = pallas_cholesky._csl_bwd(bs, "hi", (Lp, alpha), (g1, g2))
    sym = lambda g: np.asarray(0.5 * (g + g.T))
    np.testing.assert_allclose(sym(Kbar), sym(gK_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Dbar), np.asarray(gD_ref),
                               atol=1e-8)


def test_op_probe_env_pins(monkeypatch):
    # pin -> cache -> probe resolution for the unified op probes; on CPU
    # only the pin and probe-skip paths are exercised (no TPU probing)
    from gpflow_slim_tpu.ops import autotune

    monkeypatch.setenv("GFS_PALLAS_TRSM", "1")
    assert autotune.trsm_wide_choice(512, 256, jnp.float32) == "pallas"
    monkeypatch.setenv("GFS_PALLAS_TRSM", "0")
    assert autotune.trsm_wide_choice(512, 256, jnp.float32) is None
    # probe-skip fast path: a thin RHS cannot fill an MXU tile row —
    # never probed, never routed, even with the pin set
    monkeypatch.setenv("GFS_PALLAS_TRSM", "1")
    assert autotune.trsm_wide_choice(512, 64, jnp.float32) is None

    monkeypatch.setenv("GFS_PALLAS_BATCHED_TRSM", "1")
    assert autotune.trsm_batched_choice(4, 256, jnp.float32) == "pallas"
    monkeypatch.setenv("GFS_PALLAS_BATCHED_TRSM", "0")
    assert autotune.trsm_batched_choice(4, 256, jnp.float32) is None

    monkeypatch.setenv("GFS_PALLAS_GRAM", "1")
    assert autotune.gram_choice(
        4096, 4096, 1, "rbf", jnp.float32) == "pallas"
    monkeypatch.setenv("GFS_PALLAS_GRAM", "0")
    assert autotune.gram_choice(
        4096, 4096, 1, "rbf", jnp.float32) is None
    # small grams skip the probe entirely when unpinned
    monkeypatch.delenv("GFS_PALLAS_GRAM")
    assert autotune.gram_choice(256, 256, 1, "rbf", jnp.float32) is None
