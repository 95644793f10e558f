"""Fused pairwise kernel-matrix (Gram) construction in Pallas (Mosaic).

Native-equivalent #1 of SURVEY §2.1: replaces the reference's TF C++
matmul+broadcast chain with one fused TPU kernel per output tile: the
‖x‖² − 2·x·x'ᵀ + ‖x'‖² expansion rides the MXU, the elementwise kernel map
(exp/Matérn/…) fuses into the same tile while it is in VMEM — one HBM
round-trip for the whole Gram instead of separate dist/exp passes.

Forward is Pallas; backward is a ``custom_vjp`` that reuses the XLA
composite (jax.vjp of the jnp reference formula) — bitwise-validated against
the stock path in tests (interpret mode on CPU, compiled on TPU).

Supported stationary maps (static ``kind``):
  rbf:      σ² exp(−d²/2)
  matern12: σ² exp(−r)
  matern32: σ² (1+√3r) exp(−√3r)
  matern52: σ² (1+√5r+5r²/3) exp(−√5r)
  exponential (GPflow-1.x quirk): σ² exp(−r/2)
with r = sqrt(d² + 1e-12), matching kernels.py exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_EUCLID_EPS = 1e-12
_KINDS = ("rbf", "matern12", "matern32", "matern52", "exponential", "cosine")


def _apply_map(kind, variance, d2):
    if kind == "rbf":
        return variance * jnp.exp(-0.5 * d2)
    r = jnp.sqrt(d2 + _EUCLID_EPS)
    if kind == "matern12":
        return variance * jnp.exp(-r)
    if kind == "matern32":
        s3 = np.sqrt(3.0)
        return variance * (1.0 + s3 * r) * jnp.exp(-s3 * r)
    if kind == "matern52":
        s5 = np.sqrt(5.0)
        return variance * (1.0 + s5 * r + 5.0 / 3.0 * d2) * jnp.exp(-s5 * r)
    if kind == "exponential":
        return variance * jnp.exp(-0.5 * r)
    if kind == "cosine":
        return variance * jnp.cos(r)
    raise ValueError(f"unknown kind {kind!r}")


def _gram_kernel(kind, x_ref, y_ref, var_ref, out_ref):
    # x: (TM, D), y: (TN, D) — both pre-scaled by lengthscales
    x = x_ref[:]
    y = y_ref[:]
    xs = jnp.sum(jnp.square(x), axis=1, keepdims=True)  # (TM, 1)
    ys = jnp.sum(jnp.square(y), axis=1, keepdims=True)  # (TN, 1)
    # HIGHEST: full-f32 MXU passes. The d² expansion is cancellation-
    # critical (diag must cancel to ~0); default bf16-product passes give
    # O(2⁻⁹) relative error — at ‖x‖²~1e2 that is O(0.4) absolute on the
    # diagonal, enough to break PD-ness downstream. D is small, so the
    # extra passes cost nothing next to the tile's elementwise map.
    cross = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TM, TN)
    d2 = jnp.maximum(xs - 2.0 * cross + ys.T, 0.0)
    out_ref[:] = _apply_map(kind, var_ref[0, 0], d2).astype(out_ref.dtype)


def _pad_rows(X, mult):
    n = X.shape[0]
    rem = (-n) % mult
    if rem == 0:
        return X
    return jnp.concatenate(
        [X, jnp.zeros((rem, X.shape[1]), X.dtype)], axis=0
    )


@functools.partial(jax.jit, static_argnames=("kind", "tile"))
def _gram_pallas(kind, Xs, X2s, variance, tile=256):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D = Xs.shape
    M = X2s.shape[0]
    Xp = _pad_rows(Xs, tile)
    Yp = _pad_rows(X2s, tile)
    Np, Mp = Xp.shape[0], Yp.shape[0]
    var = jnp.reshape(variance.astype(Xs.dtype), (1, 1))

    out = pl.pallas_call(
        functools.partial(_gram_kernel, kind),
        grid=(Np // tile, Mp // tile),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), Xs.dtype),
    )(Xp, Yp, var)
    return out[:N, :M]


def _gram_reference(kind, Xs, X2s, variance):
    """The jnp composite (matches kernels.Stationary math exactly,
    including the HIGHEST-precision cross matmul — this is the VJP path,
    and gradient cancellation mirrors the forward's)."""
    xs = jnp.sum(jnp.square(Xs), axis=-1)
    ys = jnp.sum(jnp.square(X2s), axis=-1)
    cross = jnp.matmul(Xs, X2s.T, precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(xs[:, None] - 2.0 * cross + ys[None, :], 0.0)
    return _apply_map(kind, variance, d2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def stationary_gram(kind, Xs, X2s, variance):
    """Fused Gram K(Xs, X2s) with pre-scaled inputs; differentiable.

    ``Xs = X / lengthscales`` (caller handles ARD scaling so lengthscale
    grads flow through the scaling op outside the kernel).
    """
    return _gram_pallas(kind, Xs, X2s, variance)


def _fwd(kind, Xs, X2s, variance):
    return _gram_pallas(kind, Xs, X2s, variance), (Xs, X2s, variance)


def _bwd(kind, res, g):
    Xs, X2s, variance = res
    _, vjp = jax.vjp(
        lambda a, b, v: _gram_reference(kind, a, b, v), Xs, X2s, variance
    )
    return vjp(g)


stationary_gram.defvjp(_fwd, _bwd)


def _gram_lower_kernel(kind, x_ref, y_ref, var_ref, out_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(i >= j)
    def _():
        _gram_kernel(kind, x_ref, y_ref, var_ref, out_ref)

    @pl.when(i < j)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit, static_argnames=("kind", "tile", "interpret"))
def _gram_lower_pallas(kind, Xs, variance, tile=256, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D = Xs.shape
    Xp = _pad_rows(Xs, tile)
    Np = Xp.shape[0]
    var = jnp.reshape(jnp.asarray(variance, Xs.dtype), (1, 1))

    out = pl.pallas_call(
        functools.partial(_gram_lower_kernel, kind),
        grid=(Np // tile, Np // tile),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Np), Xs.dtype),
        interpret=interpret,
    )(Xp, Xp, var)
    return out[:N, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def stationary_gram_lower(kind, Xs, variance):
    """Lower triangle of the symmetric Gram K(Xs, Xs); upper tiles zero.

    For consumers that only read the lower triangle — Cholesky with
    ``symmetrize_input=False`` — this skips the elementwise kernel map on
    the upper tiles (the d² expansion and map run only where ``i ≥ j`` in
    the tile grid). The VJP is exact for such consumers: their cotangent
    is supported on the lower triangle, where this kernel's output equals
    the full Gram's, so the reference composite's VJP applies unchanged
    (upper-tile cotangents are zero and contribute nothing).
    """
    return _gram_lower_pallas(kind, Xs, variance)


def _lower_fwd(kind, Xs, variance):
    return _gram_lower_pallas(kind, Xs, variance), (Xs, variance)


def _lower_bwd(kind, res, g):
    Xs, variance = res
    _, vjp = jax.vjp(
        lambda a, v: _gram_reference(kind, a, a, v), Xs, variance
    )
    return vjp(g)


stationary_gram_lower.defvjp(_lower_fwd, _lower_bwd)


def gram_interpret_mode(kind, Xs, X2s, variance, tile=128):
    """Interpret-mode execution for CPU equivalence tests."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D = Xs.shape
    M = X2s.shape[0]
    Xp = _pad_rows(Xs, tile)
    Yp = _pad_rows(X2s, tile)
    Np, Mp = Xp.shape[0], Yp.shape[0]
    var = jnp.reshape(jnp.asarray(variance, Xs.dtype), (1, 1))

    out = pl.pallas_call(
        functools.partial(_gram_kernel, kind),
        grid=(Np // tile, Mp // tile),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, D), lambda i, j: (j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), Xs.dtype),
        interpret=True,
    )(Xp, Yp, var)
    return out[:N, :M]


def _gram_chol_operand_kernel(kind, N, tile, im_ref, jm_ref, x_ref,
                              sc_ref, out_ref):
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    bi = im_ref[t]
    bj = jm_ref[t]
    # X stays VMEM-resident across the whole grid (constant index map —
    # it is KB-scale); per-tile row slices are taken here rather than by
    # per-step (tile, D) input DMAs, whose fixed cost dominated the
    # kernel (~2 tiny DMAs × ~1-2 µs per tile, measured 2026-08-21)
    x = x_ref[pl.ds(bi * tile, tile), :]
    y = x_ref[pl.ds(bj * tile, tile), :]
    var = sc_ref[0]
    noise = sc_ref[1]
    if x.shape[1] == 1:
        # 1-D inputs: the direct (x − yᵀ)² distance is both cheaper on
        # the VPU than the ‖x‖²−2xyᵀ+‖y‖² expansion (the kernel is
        # elementwise-bound, measured 2026-08-21) and EXACT — no
        # cancellation, no max(·,0) clamp, no HIGHEST matmul needed
        diff = x - y.reshape(1, -1)
        d2 = diff * diff
    else:
        xs = jnp.sum(jnp.square(x), axis=1, keepdims=True)
        ys = jnp.sum(jnp.square(y), axis=1, keepdims=True)
        acc = x.dtype if x.dtype == jnp.float64 else jnp.float32
        cross = jax.lax.dot_general(
            x, y, (((1,), (1,)), ((), ())),
            preferred_element_type=acc,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = jnp.maximum(xs - 2.0 * cross + ys.T, 0.0)
    k = _apply_map(kind, var, d2)
    rl = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    cl = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    rg = rl + bi * tile
    cg = cl + bj * tile
    eye = (rg == cg).astype(k.dtype)
    valid = (rg < N) & (cg < N)
    # valid region: K + noise·I ; pad extension: unit diagonal (the
    # leading-principal-nested Cholesky never reads anything else)
    out_ref[:] = jnp.where(valid, k + noise * eye, eye).astype(
        out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kind", "pad_to", "tile", "interpret"))
def _gram_chol_operand_pallas(kind, Xs, variance, noise, pad_to,
                              tile=None, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D = Xs.shape
    Np = pad_to
    if tile is None:
        # largest supported tile dividing the padded size: per-tile grid
        # overhead dominates small tiles (512: 3.38 ms, 256: 3.65,
        # 128: 4.03 at N=10240, measured 2026-08-21)
        tile = next(t for t in (512, 256, 128) if Np % t == 0)
    assert Np % tile == 0 and Np >= N
    nbt = Np // tile
    Xp = jnp.concatenate(
        [Xs, jnp.zeros((Np - N, D), Xs.dtype)], axis=0
    ) if Np > N else Xs
    lower = [(i, j) for i in range(nbt) for j in range(i + 1)]
    im = jnp.asarray(np.array([p[0] for p in lower], np.int32))
    jm = jnp.asarray(np.array([p[1] for p in lower], np.int32))
    scal = jnp.stack([jnp.asarray(variance, Xs.dtype),
                      jnp.asarray(noise, Xs.dtype)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(lower),),
        in_specs=[
            pl.BlockSpec((Np, D), lambda t, im_, jm_: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile), lambda t, im_, jm_: (im_[t], jm_[t])),
    )
    return pl.pallas_call(
        functools.partial(_gram_chol_operand_kernel, kind, N, tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Np, Np), Xs.dtype),
        interpret=interpret,
    )(im, jm, Xp, scal)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4))
def stationary_gram_chol_operand(kind, Xs, variance, noise, pad_to):
    """One-pass Cholesky operand: lower tiles of ``K(Xs,Xs) + noise·I``
    padded to ``pad_to`` with a unit-diagonal extension.

    HALF the tile grid of the full Gram (strictly-upper tiles are never
    visited — their content is UNSPECIFIED), the noise-diagonal add and
    the pad extension are fused into the same single output pass — this
    kernel + ``pallas_cholesky.cholesky_solve_logdet`` is the whole
    exact-GPR objective pipeline with no other N² traffic. Consumers
    MUST read only the lower triangle (the fused Cholesky does; its
    in-tile masking tolerates arbitrary garbage above the diagonal).

    VJP: the consumer's dependence through the lower triangle equals its
    dependence on the full symmetric ``K + noise·I`` (it is built
    symmetrically), so the cotangent — symmetric, from the Cholesky VJP —
    back-propagates through the reference full-Gram composite, exactly as
    ``stationary_gram_lower`` does.
    """
    return _gram_chol_operand_pallas(kind, Xs, variance, noise, pad_to)


def _opnd_fwd(kind, Xs, variance, noise, pad_to):
    out = _gram_chol_operand_pallas(kind, Xs, variance, noise, pad_to)
    return out, (Xs, variance, noise)


def _opnd_bwd(kind, pad_to, res, g):
    Xs, variance, noise = res
    N = Xs.shape[0]
    gv = g[:N, :N]
    _, vjp = jax.vjp(
        lambda a, v, n: _gram_reference(kind, a, a, v)
        + n * jnp.eye(N, dtype=a.dtype),
        Xs, variance, noise,
    )
    return vjp(gv)


stationary_gram_chol_operand.defvjp(_opnd_fwd, _opnd_bwd)
