"""Blocked triangular solve (TRSM) as a Pallas TPU kernel.

Native-equivalent #3 of SURVEY §2.1: replaces
``tf.linalg.triangular_solve``. Forward/backward substitution over bs×bs
blocks: the diagonal triangle is inverted once in VMEM (row substitution)
and every other operation is an MXU GEMM with HBM-resident operands —
supports wide right-hand sides (N×P) as used by GP predictions
(``A = L⁻¹ Kmn`` with P = number of test points).

Backward: ``custom_vjp`` with the standard TRSM adjoint
(dB = L⁻ᵀ g; dL = −tril(dB Xᵀ)) evaluated via the same kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_cholesky import _MM_PRECISION, _vmem_tri_inverse


def _make_trsm_kernel(nb: int, bs: int, pcols: int, lower: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(L, _, X, zinv, lblk, xk, xi, sem):
        def Lblk(i, j):
            return L.at[pl.ds(i * bs, bs), pl.ds(j * bs, bs)]

        def Xblk(i):
            return X.at[pl.ds(i * bs, bs), :]

        def copy(src, dst):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()

        def step(t, _):
            k = t if lower else nb - 1 - t
            # invert diagonal triangle once
            copy(Lblk(k, k), lblk)
            tri = lblk[:] if lower else lblk[:].T
            Z = _vmem_tri_inverse(tri)  # (bs, bs) lower inverse
            zinv[:] = Z if lower else Z.T

            copy(Xblk(k), xk)
            xk[:] = jax.lax.dot_general(
                zinv[:], xk[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_MM_PRECISION,
            ).astype(xk.dtype)
            copy(xk, Xblk(k))

            # eliminate from the remaining rows
            def elim(i_raw, _):
                i = i_raw if lower else nb - 1 - i_raw
                copy(Lblk(i, k) if lower else Lblk(i, k), lblk)
                copy(Xblk(i), xi)
                xi[:] = (
                    xi[:]
                    - jax.lax.dot_general(
                        lblk[:], xk[:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_MM_PRECISION,
                    )
                ).astype(xi.dtype)
                copy(xi, Xblk(i))
                return 0

            if lower:
                jax.lax.fori_loop(k + 1, nb, elim, 0)
            else:
                jax.lax.fori_loop(t + 1, nb, elim, 0)
            return 0

        jax.lax.fori_loop(0, nb, step, 0)

    return kernel


def _pad(A, bs, axis):
    n = A.shape[axis]
    rem = (-n) % bs
    if rem == 0:
        return A
    pad = [(0, 0), (0, 0)]
    pad[axis] = (0, rem)
    return jnp.pad(A, pad)


@functools.partial(
    jax.jit, static_argnames=("lower", "block_size", "interpret")
)
def _trsm_pallas(L, B, lower: bool = True, block_size: int = 256,
                 interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = L.shape[0]
    bs = block_size
    B2 = B if B.ndim == 2 else B[:, None]
    P = B2.shape[1]
    pc = max(128, P + ((-P) % 128))

    Lp = _pad(_pad(L, bs, 0), bs, 1)
    if (-N) % bs:
        # unit diagonal extension keeps the padded triangle invertible
        idx = jnp.arange(N, Lp.shape[0])
        Lp = Lp.at[idx, idx].set(1.0)
    Bp = jnp.pad(B2, ((0, (-N) % bs), (0, pc - P)))
    Np = Lp.shape[0]
    nb = Np // bs

    out = pl.pallas_call(
        _make_trsm_kernel(nb, bs, pc, lower),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Np, pc), B2.dtype),
        scratch_shapes=[
            pltpu.VMEM((bs, bs), L.dtype),   # zinv
            pltpu.VMEM((bs, bs), L.dtype),   # L block
            pltpu.VMEM((bs, pc), B2.dtype),  # X_k
            pltpu.VMEM((bs, pc), B2.dtype),  # X_i
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True,
        ),
    )(Lp, Bp)
    out = out[:N, :P]
    return out if B.ndim == 2 else out[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _trsm(L, B, lower):
    return _trsm_pallas(L, B, lower=lower)


def _trsm_fwd(L, B, lower):
    X = _trsm_pallas(L, B, lower=lower)
    return X, (L, X)


def _trsm_bwd(lower, res, g):
    L, X = res
    # adjoint: dB = L⁻ᵀ g ; dL = −tri(dB Xᵀ). HIGHEST matmul — TPU-default
    # bf16 products put 2⁻⁹-level noise on the gradient (see the matching
    # fix in pallas_cholesky._chol_vjp_bwd).
    gB = _trsm_pallas(L.T, g, lower=not lower)
    X2 = X if X.ndim == 2 else X[:, None]
    g2 = gB if gB.ndim == 2 else gB[:, None]
    dL = -jnp.matmul(g2, X2.T, precision=jax.lax.Precision.HIGHEST)
    dL = jnp.tril(dL) if lower else jnp.triu(dL)
    return dL, gB


_trsm.defvjp(_trsm_fwd, _trsm_bwd)


def _make_batched_trsm_kernel(lower: bool):
    def kernel(l_ref, b_ref, out_ref):
        L = l_ref[0]  # (M, M) — one batch element per grid step
        B = b_ref[0]  # (M, K)
        Z = _vmem_tri_inverse(L if lower else L.T)  # lower inverse
        Zi = Z if lower else Z.T
        out_ref[0] = jax.lax.dot_general(
            Zi, B, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MM_PRECISION,
        ).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("lower", "interpret"))
def _batched_trsm_pallas(L, B, lower: bool = True, interpret: bool = False):
    """Solve L[p] X[p] = B[p] for a leading batch dim: grid over p, one
    whole (M, M) triangle per VMEM tile (M up to ~1024 in f32). The
    triangle is inverted once per batch element (blocked Newton/
    substitution — ``_vmem_tri_inverse``) and applied as a single MXU
    GEMM; this replaces a vmap'd XLA substitution chain of M sequential
    steps per element."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, M, _ = L.shape
    K = B.shape[2]
    # pad M to the 128-lane tile AND the _SUB panel multiple; keep the
    # padded triangle invertible with a unit-diagonal extension
    Mp = M + ((-M) % 128)
    Kp = K + ((-K) % 128)
    if Mp != M:
        Lp = jnp.zeros((P, Mp, Mp), L.dtype)
        Lp = Lp.at[:, :M, :M].set(L)
        idx = jnp.arange(M, Mp)
        Lp = Lp.at[:, idx, idx].set(1.0)
    else:
        Lp = L
    Bp = jnp.pad(B, ((0, 0), (0, Mp - M), (0, Kp - K)))

    out = pl.pallas_call(
        _make_batched_trsm_kernel(lower),
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, Mp, Mp), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, Mp, Kp), lambda p: (p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Mp, Kp), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, Mp, Kp), B.dtype),
        interpret=interpret,
    )(Lp, Bp)
    return out[:, :M, :K]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _batched_trsm(L, B, lower):
    return _batched_trsm_pallas(L, B, lower=lower)


def _batched_trsm_fwd(L, B, lower):
    X = _batched_trsm_pallas(L, B, lower=lower)
    return X, (L, X)


def _batched_trsm_bwd(lower, res, g):
    L, X = res
    gB = _batched_trsm_pallas(
        jnp.swapaxes(L, 1, 2), g, lower=not lower
    )
    dL = -jnp.einsum("pik,pjk->pij", gB, X,
                     precision=jax.lax.Precision.HIGHEST)
    dL = jnp.tril(dL) if lower else jnp.triu(dL)
    return dL, gB


_batched_trsm.defvjp(_batched_trsm_fwd, _batched_trsm_bwd)


def batched_solve_lower(L, B):
    """Solve L[p] X = B[p], L (P, M, M) lower, B (P, M, K)."""
    return _batched_trsm(L, B, True)


def batched_solve_upper(U, B):
    """Solve U[p] X = B[p], U (P, M, M) upper, B (P, M, K)."""
    return _batched_trsm(U, B, False)


def batched_solve_lower_interpret(L, B):
    return _batched_trsm_pallas(L, B, lower=True, interpret=True)


def batched_solve_upper_interpret(U, B):
    return _batched_trsm_pallas(U, B, lower=False, interpret=True)


def solve_lower(L, B, block_size: int = 256):
    return _trsm(L, B, True)


def solve_upper(U, B, block_size: int = 256):
    return _trsm(U, B, False)


def solve_lower_interpret(L, B, block_size: int = 64):
    return _trsm_pallas(L, B, lower=True, block_size=block_size,
                        interpret=True)


def solve_upper_interpret(U, B, block_size: int = 64):
    return _trsm_pallas(U, B, lower=False, block_size=block_size,
                        interpret=True)
