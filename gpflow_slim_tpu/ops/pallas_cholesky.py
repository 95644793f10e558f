"""Blocked Cholesky factorization as a single Pallas (Mosaic) TPU kernel.

Native-equivalent #2 of SURVEY §2.1: replaces ``tf.linalg.cholesky``
(Eigen LLT / cuSOLVER potrf in the reference's runtime). Right-looking
blocked algorithm, entirely on-chip control flow:

  for k in 0..nb-1:
    1. DMA the bs×bs diagonal block HBM→VMEM; factor it in VMEM with a
       vectorized rank-1-update loop (VPU);
    2. invert the bs×bs triangle once (row-substitution loop) so the panel
       TRSM becomes a GEMM (MXU) — the classic trick;
    3. panel: for each block below, DMA → multiply by Lkk⁻ᵀ (MXU) → DMA back;
    4. trailing SYRK: for each (i,j) block of the trailing matrix,
       C -= A·Bᵀ with three DMAs and one MXU matmul.

The matrix lives in HBM (``pltpu.ANY``) and is factored in place via
``input_output_aliases``; only bs×bs tiles ever touch VMEM, so N is bounded
by HBM, not VMEM. O(N³/3) MXU flops — the flop count the full-slab XLA
fallback (ops.blocked) triples.

Backward: ``custom_vjp`` via the standard Cholesky-VJP formula evaluated
with XLA ops (validated against ``jax.scipy`` in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _tril_mask(bs, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    return (r >= c).astype(dtype)


_SUB = 64  # in-tile sub-panel width (MXU-friendly, static unrolled)


def _vmem_cholesky_small(a):
    """Unblocked masked-rank-1 Cholesky of a small (≤_SUB) SPD tile.

    This loop is the irreducibly serial core of the whole factorization
    (bs total iterations per outer block step), so the body is tuned for
    VPU op count: ONE full-tile reduce per iteration (the raw column),
    with the pivot extracted from it by a (bs,1) reduce, and the
    pivot-sqrt/divides fused into a single rsqrt broadcast.
    """
    bs = a.shape[0]
    r2 = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    rcol = r2[:, :1]  # (bs, 1) row indices

    def body(j, a):
        colsel = (c2 == j).astype(a.dtype)
        col_raw = jnp.sum(a * colsel, axis=1, keepdims=True)  # (bs, 1)
        pivsq = jnp.sum(
            jnp.where(rcol == j, col_raw, 0.0))  # a[j, j]
        inv = jax.lax.rsqrt(pivsq)
        # rank-1 update as a BROADCAST multiply (VPU, exact f32) — NOT a
        # K=1 matmul: on the MXU a default-precision `colm @ colm.T`
        # rounds products to bf16 (2⁻⁹), and 64 accumulated rank-1
        # updates of O(1) columns put ~1e-2 error into the Schur
        # complement — enough to push later pivots of a jittered Gram
        # negative (NaN at N≥2048, observed on-chip 2026-08-20; the CPU
        # interpret path is always exact-f32, which hid it).
        colm = jnp.where(rcol > j, col_raw * inv, 0.0)
        Lcol = jnp.where(rcol == j, pivsq * inv, colm)  # √p = p·p^{-1/2}
        a = a - colm * colm.reshape(1, -1)
        a = jnp.where(c2 == j, Lcol, a)
        return a

    a = jax.lax.fori_loop(0, bs, body, a)
    return a * _tril_mask(bs, a.dtype)


def _vmem_tri_inverse_small(L):
    """Z = L⁻¹ for a small lower triangle, masked row substitution."""
    bs = L.shape[0]
    r2 = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    c1 = c2[:1, :]  # (1, bs) column indices

    def body(j, Z):
        rowsel = (r2 == j).astype(L.dtype)
        Lrow = jnp.sum(L * rowsel, axis=0, keepdims=True)  # (1, bs)
        Ljj = jnp.sum(L * ((r2 == j) & (c2 == j)).astype(L.dtype))
        masked = jnp.where(c1 < j, Lrow, 0.0)  # strictly-left entries
        e_j = (c1 == j).astype(L.dtype)
        # _mm, not `@`: substitution against inverted rows amplifies
        # default-precision bf16 products (see the rank-1 note above)
        rhs = (e_j - _mm(masked, Z)) / Ljj
        return jnp.where(r2 == j, rhs, Z)

    Z0 = jnp.zeros_like(L)
    return jax.lax.fori_loop(0, bs, body, Z0)


def _vmem_tri_inverse_newton(L):
    """Z = L⁻¹ via Newton–Schulz — EXACT in ⌈log2(bs)⌉ iterations.

    Write L = D(I+N) with N strictly lower (nilpotent, Nᵇˢ = 0). With
    X₀ = D⁻¹ (reciprocal diagonal), the residual E₀ = I − L·X₀ is strictly
    lower-triangular, and each Newton step X ← X(2I − LX) squares it:
    E_{t} = E₀^(2^t) = 0 once 2^t ≥ bs. So the O(bs)-step sequential
    substitution loop becomes ⌈log2 bs⌉ MXU GEMM pairs — the sequential
    scalar chain that dominated the kernel's critical path disappears.

    Stability: the residual powers are exact only in exact arithmetic; in
    f32 the intermediate E₀^(2^t) entries can transiently overflow when
    |L_ij| ≫ L_jj (wildly unequal pivots). We therefore iterate on the
    symmetrically scaled L' = S L S with S = |D|^{-1/2} (diagonal ±1,
    entries L_ij/√|dᵢdⱼ|) and unscale afterwards: L⁻¹ = S L'⁻¹ S. The
    sign is folded into the initial iterate X₀ = diag(sign d), so that
    E₀ = I − L'X₀ stays strictly lower triangular (nilpotent) and the
    iteration remains exact for triangles with NEGATIVE diagonal entries
    too — this routine also serves the general TRSM kernels, not just
    Cholesky factors. For tiles that arise from jittered SPD GP blocks
    the scaled off-diagonals are O(1) and the iteration is overflow-free;
    the sequential-substitution inverse remains in the source
    (``_vmem_tri_inverse_small``) as the fallback for pathological inputs.
    """
    bs = L.shape[0]
    r2 = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    eye = (r2 == c2).astype(L.dtype)
    d = jnp.sum(L * eye, axis=1, keepdims=True)  # (bs, 1) diagonal
    s = jax.lax.rsqrt(jnp.abs(d))  # |D|^{-1/2}, column vector
    sign = jnp.where(d < 0, -1.0, 1.0).astype(L.dtype)  # (bs, 1)
    Ls = L * s * s.reshape(1, bs)  # S L S, diagonal = sign(d)
    X = eye * sign  # X₀ = diag(sign d) ⇒ I − L'X₀ strictly lower
    two_eye = 2.0 * eye
    n_iter = max(1, int(np.ceil(np.log2(bs))))
    for _ in range(n_iter):
        X = _mm(X, two_eye - _mm(Ls, X))
    X = X * s * s.reshape(1, bs)  # unscale: D^{-1/2} X' D^{-1/2}
    return X * _tril_mask(bs, L.dtype)


# MXU pass count for the small-triangle GEMMs (Newton inverses, panel
# TRSM): HIGHEST = full-f32 (6 bf16 passes). These multiply by INVERTED
# triangles, so their rounding is amplified by the block condition number —
# keep them exact. Default bf16 (1 pass, ~2⁻⁹ products) is never safe here:
# it can push small pivots negative (NaN), measured in round 1.
_MM_PRECISION = jax.lax.Precision.HIGHEST

# The trailing SYRK (A[i,j] -= L[i,k]·L[j,k]ᵀ) carries ~all of the N³/3
# flops and has no inverse amplification, so fewer MXU passes are
# attractive there — but Mosaic's in-kernel dot lowering supports only
# DEFAULT and HIGHEST ("Unsupported dot precision: HIGH", measured
# 2026-08-20). The manual hi/lo bf16 split IS implemented as the
# ``syrk="s3"``/``"s4"`` kernel variants (3/4 passes): measured
# accuracy/speed table in docs/PERFORMANCE.md — probed when
# GFS_PALLAS_CHOL_SPLIT3=1, since its logdet error class differs from
# the HIGHEST default.
_SYRK_PRECISION = jax.lax.Precision.HIGHEST


def _mm(A, B, ta=False, tb=False):
    dims = ((1,) if not ta else (0,), (0,) if not tb else (1,))
    # accumulate in the operand dtype: f32 on the TPU kernel path, but
    # full f64 when these helpers run inside the x64 parity paths (the
    # distributed XLA-level factorizations share them)
    acc = A.dtype if A.dtype == jnp.float64 else jnp.float32
    out = jax.lax.dot_general(
        A, B, ((dims[0], dims[1]), ((), ())),
        preferred_element_type=acc,
        precision=_MM_PRECISION,
    )
    return out.astype(A.dtype)


def _split_blocks(a, s):
    nb = a.shape[0] // s
    return [
        [a[i * s : (i + 1) * s, j * s : (j + 1) * s] for j in range(nb)]
        for i in range(nb)
    ]


def _join_blocks(blocks):
    return jnp.concatenate(
        [jnp.concatenate(row, axis=1) for row in blocks], axis=0
    )


def _vmem_cholesky_inv(a):
    """Blocked in-VMEM Cholesky of a bs×bs SPD tile, returning (L, L⁻¹).

    Factored in _SUB-wide panels over a static nested block list (Mosaic
    supports static slices/concats but not scatter/.at updates): the small
    diagonal factor uses the masked rank-1 loop, the panel TRSM becomes a
    GEMM against the small triangle inverse, the trailing SYRK runs on the
    MXU. Sequential scalar work drops from O(bs) full-width steps to O(bs)
    tiny ones + GEMMs.

    The full-tile inverse is assembled from the _SUB-leaf inverses (which
    the panel GEMMs already compute) by hierarchical block doubling,

        [[A, 0], [B, C]]⁻¹ = [[A⁻¹, 0], [−C⁻¹ B A⁻¹, C⁻¹]],

    log2(bs/_SUB) levels of GEMM pairs whose operands start at _SUB and
    double per level — O(bs³/4) total flops. This replaced the full-tile
    Newton–Schulz inverse (⌈log2 bs⌉ *dependent* bs³ GEMM pairs — ~6×
    more MXU work on the serial critical path of every panel step; the
    change was worth ~10% of the whole factorization at N=10240, bs=512,
    measured 2026-08-21).
    """
    bs = a.shape[0]
    if bs <= _SUB:
        L = _vmem_cholesky_small(a)
        return L, _vmem_tri_inverse_newton(L)
    assert bs % _SUB == 0
    if bs > 8 * _SUB:
        # binary split above 8 leaves: the flat panel schedule's trace is
        # O((bs/_SUB)³) small GEMMs — at bs=1024 that is ~1400 Mosaic ops
        # and the compile time explodes (>8 min, observed 2026-08-21).
        # One recursion level keeps every sub-factor on the tuned 8-leaf
        # path and adds just two bs/2 GEMMs + the doubling assembly.
        h = bs // 2
        A11 = jax.lax.slice(a, (0, 0), (h, h))
        A21 = jax.lax.slice(a, (h, 0), (bs, h))
        A22 = jax.lax.slice(a, (h, h), (bs, bs))
        L1, Z1 = _vmem_cholesky_inv(A11)
        W = _mm(A21, Z1, tb=True)
        S = A22 - _mm(W, W, tb=True)
        L2, Z2 = _vmem_cholesky_inv(S)
        zh = jnp.zeros((h, h), a.dtype)
        L = jnp.concatenate([
            jnp.concatenate([L1, zh], axis=1),
            jnp.concatenate([W, L2], axis=1),
        ], axis=0)
        X = -_mm(Z2, _mm(W, Z1))
        Z = jnp.concatenate([
            jnp.concatenate([Z1, zh], axis=1),
            jnp.concatenate([X, Z2], axis=1),
        ], axis=0)
        return L, Z
    nb = bs // _SUB
    s = _SUB
    B = _split_blocks(a, s)
    zero = jnp.zeros((s, s), a.dtype)

    Zd = [None] * nb
    for p in range(nb):
        Ld = _vmem_cholesky_small(B[p][p])
        Zd[p] = _vmem_tri_inverse_newton(Ld)
        B[p][p] = Ld
        for j in range(p + 1, nb):
            B[p][j] = zero  # upper triangle of the result
        W = {}
        for i in range(p + 1, nb):
            W[i] = _mm(B[i][p], Zd[p], tb=True)
            B[i][p] = W[i]
        for i in range(p + 1, nb):
            for j in range(p + 1, i + 1):
                B[i][j] = B[i][j] - _mm(W[i], W[j], tb=True)
    L = _join_blocks(B)

    # hierarchical doubling of the leaf inverses (requires bs/_SUB a power
    # of two — all supported block sizes are)
    assert nb & (nb - 1) == 0, "block_size/_SUB must be a power of two"
    invs = Zd
    d = s
    while d < bs:
        merged = []
        for t in range(len(invs) // 2):
            Ai, Ci = invs[2 * t], invs[2 * t + 1]
            r0 = 2 * t * d
            Bblk = jax.lax.slice(L, (r0 + d, r0), (r0 + 2 * d, r0 + d))
            X = -_mm(Ci, _mm(Bblk, Ai))
            zd = jnp.zeros((d, d), a.dtype)
            merged.append(jnp.concatenate([
                jnp.concatenate([Ai, zd], axis=1),
                jnp.concatenate([X, Ci], axis=1),
            ], axis=0))
        invs = merged
        d *= 2
    return L, invs[0]


def _vmem_cholesky(a):
    """Blocked in-VMEM Cholesky of a bs×bs SPD tile (factor only)."""
    if a.shape[0] <= _SUB:
        return _vmem_cholesky_small(a)
    return _vmem_cholesky_inv(a)[0]


def _vmem_tri_inverse(L):
    """Blocked Z = L⁻¹ of a bs×bs lower triangle.

    Small diagonal blocks by row substitution; off-diagonal blocks via
    Z[i,p] = −Z[i,i] Σ_{p≤k<i} L[i,k] Z[k,p] — static MXU matmuls.
    """
    bs = L.shape[0]
    if bs <= _SUB:
        return _vmem_tri_inverse_small(L)
    assert bs % _SUB == 0
    nb = bs // _SUB
    s = _SUB
    LB = _split_blocks(L, s)
    zero = jnp.zeros((s, s), L.dtype)

    Zd = [_vmem_tri_inverse_newton(LB[i][i]) for i in range(nb)]
    Z = [[zero for _ in range(nb)] for _ in range(nb)]
    for i in range(nb):
        Z[i][i] = Zd[i]
    for p in range(nb):
        for i in range(p + 1, nb):
            acc = zero
            for k in range(p, i):
                acc = acc + _mm(LB[i][k], Z[k][p])
            Z[i][p] = -_mm(Zd[i], acc)
    return _join_blocks(Z)


def _make_chol_kernel(nb: int, bs: int, syrk: str = "hi",
                      fuse_p: int | None = None):
    # ``syrk`` picks the trailing-SYRK arithmetic (docs/PERFORMANCE.md
    # carries the measured speed/accuracy for each):
    #   "hi"  — Precision.HIGHEST (6 bf16 MXU passes, f32-exact)
    #   "s3"  — manual bf16 hi/lo operand split, 3 passes
    #           (hh + hl + lh; dropped lo·lo bounded by 2⁻¹⁶|a||b|)
    #   "s4"  — the split with the lo·lo pass kept (4 passes; remaining
    #           error is the 2⁻¹⁸-class split representation error)
    #   +"d"  — suffix: DIAGONAL blocks (the logdet path) always update
    #           at HIGHEST; only off-diagonal blocks use the split
    #   +"x2" — suffix: TWO-PANEL schedule — factor panels k and k+1,
    #           then apply both rank-bs updates per trailing-block visit
    #           (one C load+store serves two GEMMs): C-block DMA traffic
    #           halves, the dominant trailing term. Same arithmetic,
    #           different order. The second panel's operands reuse the
    #           diag/zinv/pan2 buffers, which are idle during trailing.
    #
    # ``fuse_p``: when set (to the RHS column count P), the kernel ALSO
    # forward-substitutes alpha = L⁻¹ D and accumulates
    # half_logdet = Σ log diag L as it factors (fused potrf+potrs):
    # alpha_k = Lkk⁻¹ d_k at each diagonal step, then every panel block
    # W_i — already in VMEM — applies alpha_i -= W_i · alpha_k. This
    # costs nb (bs,bs)@(bs,P) GEMMs per panel (P ≤ 8: noise next to the
    # SYRK) and removes the post-kernel triangular solve + its
    # pallas-boundary relayout (~2.7 ms at N=10k, measured 2026-08-21).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    two_panel = syrk.endswith("x2")
    base = syrk[:-2] if two_panel else syrk
    assert base in ("hi", "s3", "s4", "s3d", "s4d"), syrk
    split = base != "hi"
    keep_ll = base.startswith("s4")
    exact_diag = base.endswith("d")
    fuse = fuse_p is not None

    def kernel(*refs):
        if fuse:
            (_, D_in, A, alpha_out, hld_out, diag, zinv, pan2, a2, b2,
             c2, alpha_v, sem, asem, bsem, csem, psem, pwsem, wsem,
             dsem) = refs
        else:
            (_, A, diag, zinv, pan2, a2, b2, c2,
             sem, asem, bsem, csem, psem, pwsem, wsem) = refs

        if fuse:
            cp = pltpu.make_async_copy(D_in, alpha_v, dsem)
            cp.start()
            cp.wait()
            hld_out[0, 0] = jnp.zeros((), hld_out.dtype)

        def blk(i, j):
            return A.at[pl.ds(i * bs, bs), pl.ds(j * bs, bs)]

        def copy_in(src_i, src_j, dst):
            cp = pltpu.make_async_copy(blk(src_i, src_j), dst, sem)
            cp.start()
            cp.wait()

        def copy_out(src, dst_i, dst_j):
            cp = pltpu.make_async_copy(src, blk(dst_i, dst_j), sem)
            cp.start()
            cp.wait()

        def diag_panel(k):
            """Factor the k-th diagonal block, build its inverse, run the
            panel TRSM column (double-buffered loads + write-backs), plus
            the fused logdet/alpha bookkeeping."""
            # the doubling needs a few bs² live temporaries — covered by
            # the raised vmem_limit_bytes below
            copy_in(k, k, diag)
            Lkk, Zkk = _vmem_cholesky_inv(diag[:])
            diag[:] = Lkk
            copy_out(diag, k, k)
            zinv[:] = Zkk

            if fuse:
                # logdet: Σ log diag(Lkk). A unit-diagonal pad extension
                # contributes log 1 = 0, so no [:N] slicing downstream.
                ri = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
                # keepdims: Mosaic mis-lays-out 1-D reduction results
                # ("Invalid relayout ... vector<1x512xf32>", 2026-08-21)
                dvec = jnp.sum(jnp.where(ri == ci, Lkk, 0.0), axis=1,
                               keepdims=True)
                hld_out[0, 0] = hld_out[0, 0] + jnp.sum(jnp.log(dvec))
                # forward substitution for this block row
                ak = _mm(Zkk, alpha_v[pl.ds(k * bs, bs), :])
                alpha_v[pl.ds(k * bs, bs), :] = ak
            else:
                ak = None

            # panel: L[i,k] = A[i,k] @ Lkk⁻ᵀ — double-buffered loads AND
            # async write-backs. A slot's write-back must complete before
            # that slot is reloaded (two iterations later); the waits are
            # placed just before each reload plus a drain after the loop,
            # so DMA in/out both overlap the MXU.
            np_i = nb - (k + 1)

            def p_load(slot, i):
                return pltpu.make_async_copy(blk(i, k), pan2.at[slot],
                                             psem.at[slot])

            def p_write(slot, i):
                return pltpu.make_async_copy(pan2.at[slot], blk(i, k),
                                             pwsem.at[slot])

            @pl.when(np_i > 0)
            def _():
                p_load(0, k + 1).start()

            def panel_body(idx, _):
                i = k + 1 + idx
                cur = jax.lax.rem(idx, 2)
                nxt = jax.lax.rem(idx + 1, 2)

                @pl.when(idx + 1 < np_i)
                def _():
                    @pl.when(idx >= 1)
                    def _():
                        # write issued from `nxt` at idx-1 must land
                        # before the slot is reloaded
                        p_write(nxt, i - 1).wait()

                    p_load(nxt, i + 1).start()

                p_load(cur, i).wait()
                pan2[cur] = jax.lax.dot_general(
                    pan2[cur], zinv[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_MM_PRECISION,
                ).astype(pan2.dtype)
                p_write(cur, i).start()
                if fuse:
                    # W_i is in VMEM right now — the forward-substitution
                    # trailing update rides along (the in-flight
                    # write-back DMA only READS pan2[cur]; no conflict)
                    av = alpha_v[pl.ds(i * bs, bs), :]
                    alpha_v[pl.ds(i * bs, bs), :] = av - _mm(
                        pan2[cur], ak)
                return 0

            jax.lax.fori_loop(0, np_i, panel_body, 0)

            # drain the last (up to two) outstanding panel writes; the
            # trailing loop reads blk(:, k) so they must be visible
            @pl.when(np_i >= 1)
            def _():
                p_write(jax.lax.rem(np_i - 1, 2), nb - 1).wait()

            @pl.when(np_i >= 2)
            def _():
                p_write(jax.lax.rem(np_i, 2), nb - 2).wait()

        def _bf16_split(x):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        def _dot_nt(x, y, prec=None):
            return jax.lax.dot_general(
                x, y, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                **({} if prec is None else {"precision": prec}),
            )

        def trail_range(k, k2, j_lo, j_hi, fused: bool):
            """Trailing SYRK over columns j in [j_lo, j_hi):
            C(i,j) -= L(i,k)·L(j,k)ᵀ [ + L(i,k2)·L(j,k2)ᵀ when fused ].

            Double-buffered a/c loads and async c write-backs: the write
            of slot s is only awaited right before s is reloaded, so the
            MXU never idles on the store path. Per-column L(j,·) operands
            are double-buffered across j (the j+1 load is issued before
            column j's i-loop). The b prefetches read panel columns
            written by the panel phases above, so they must stay AFTER
            those drains — only then are they safe at any point here
            (this phase writes blk(i, j) with j in the given range,
            never the panel columns). In fused mode the second panel's
            operands ride the otherwise-idle buffers: a2nd in pan2/psem,
            b2nd in diag/zinv with pwsem (parity-predicated DMAs).
            """
            ncols = j_hi - j_lo

            def a_dma(slot, i):
                return pltpu.make_async_copy(blk(i, k), a2.at[slot],
                                             asem.at[slot])

            def b_dma(slot, j):
                return pltpu.make_async_copy(blk(j, k), b2.at[slot],
                                             bsem.at[slot])

            def a2_dma(slot, i):
                return pltpu.make_async_copy(blk(i, k2), pan2.at[slot],
                                             psem.at[slot])

            def b2_dma(parity, j):
                # parity-predicated: column j's second-panel operand
                # lands in diag (even j) / zinv (odd j)
                @pl.when(parity == 0)
                def _():
                    cp = pltpu.make_async_copy(blk(j, k2), diag,
                                               pwsem.at[0])
                    cp.start()

                @pl.when(parity != 0)
                def _():
                    cp = pltpu.make_async_copy(blk(j, k2), zinv,
                                               pwsem.at[1])
                    cp.start()

            def b2_wait(parity):
                @pl.when(parity == 0)
                def _():
                    pltpu.make_async_copy(blk(0, 0), diag,
                                          pwsem.at[0]).wait()

                @pl.when(parity != 0)
                def _():
                    pltpu.make_async_copy(blk(0, 0), zinv,
                                          pwsem.at[1]).wait()

            @pl.when(ncols > 0)
            def _():
                b_dma(jax.lax.rem(j_lo, 2), j_lo).start()
                if fused:
                    b2_dma(jax.lax.rem(j_lo, 2), j_lo)

            def trail_j(j, _):
                cur_b = jax.lax.rem(j, 2)

                @pl.when(j + 1 < j_hi)
                def _():
                    b_dma(jax.lax.rem(j + 1, 2), j + 1).start()
                    if fused:
                        b2_dma(jax.lax.rem(j + 1, 2), j + 1)

                b_dma(cur_b, j).wait()
                b_s = b2[cur_b]
                if fused:
                    b2_wait(cur_b)
                    b2_s = jnp.where(cur_b == 0, diag[:], zinv[:])
                if split:
                    bh, bl = _bf16_split(b_s)
                    if fused:
                        b2h, b2l = _bf16_split(b2_s)
                n_i = nb - j

                def c_dma(slot, i):
                    return pltpu.make_async_copy(blk(i, j), c2.at[slot],
                                                 csem.at[slot])

                def c_write(slot, i):
                    return pltpu.make_async_copy(c2.at[slot], blk(i, j),
                                                 wsem.at[slot])

                def update(cur, exact):
                    if split and not exact:
                        ah, al = _bf16_split(a2[cur])
                        prod = (_dot_nt(ah, bh) + _dot_nt(ah, bl)
                                + _dot_nt(al, bh))
                        if keep_ll:
                            prod = prod + _dot_nt(al, bl)
                        if fused:
                            a2h, a2l = _bf16_split(pan2[cur])
                            prod = prod + _dot_nt(a2h, b2h) + _dot_nt(
                                a2h, b2l) + _dot_nt(a2l, b2h)
                            if keep_ll:
                                prod = prod + _dot_nt(a2l, b2l)
                    else:
                        prod = _dot_nt(a2[cur], b_s,
                                       prec=_SYRK_PRECISION)
                        if fused:
                            prod = prod + _dot_nt(pan2[cur], b2_s,
                                                  prec=_SYRK_PRECISION)
                    c2[cur] = (c2[cur] - prod).astype(c2.dtype)

                def start_pair(slot, i):
                    a_dma(slot, i).start()
                    if fused:
                        a2_dma(slot, i).start()
                    c_dma(slot, i).start()

                def wait_pair(slot, i):
                    a_dma(slot, i).wait()
                    if fused:
                        a2_dma(slot, i).wait()
                    c_dma(slot, i).wait()

                # warm-up: start the first group
                start_pair(0, j)

                if exact_diag:
                    # peel idx=0 — the DIAGONAL block (i == j), the
                    # logdet path: it always updates at HIGHEST, so only
                    # off-diagonal blocks carry split error directly
                    @pl.when(n_i >= 2)
                    def _():
                        start_pair(1, j + 1)

                    wait_pair(0, j)
                    update(0, exact=True)
                    c_write(0, j).start()

                def trail_i(idx, _):
                    i = j + idx
                    cur = jax.lax.rem(idx, 2)
                    nxt = jax.lax.rem(idx + 1, 2)

                    @pl.when(idx + 1 < n_i)
                    def _():
                        @pl.when(idx >= 1)
                        def _():
                            c_write(nxt, i - 1).wait()

                        start_pair(nxt, i + 1)

                    wait_pair(cur, i)
                    update(cur, exact=False)
                    c_write(cur, i).start()
                    return 0

                jax.lax.fori_loop(1 if exact_diag else 0, n_i, trail_i, 0)

                # drain outstanding write-backs before the next j reuses
                # the slots (and before later steps read these blocks)
                @pl.when(n_i >= 1)
                def _():
                    c_write(jax.lax.rem(n_i - 1, 2), nb - 1).wait()

                @pl.when(n_i >= 2)
                def _():
                    c_write(jax.lax.rem(n_i, 2), nb - 2).wait()

                return 0

            jax.lax.fori_loop(j_lo, j_hi, trail_j, 0)

        if two_panel:
            def super_step(t, _):
                k = 2 * t
                diag_panel(k)
                # bring ONLY the next panel's column up to date ...
                trail_range(k, None, k + 1, k + 2, fused=False)
                # ... factor it ...
                diag_panel(k + 1)
                # ... then apply BOTH rank-bs updates per C-block visit
                trail_range(k, k + 1, k + 2, nb, fused=True)
                return 0

            jax.lax.fori_loop(0, nb // 2, super_step, 0)
            if nb % 2 == 1:
                # odd tail: the last block column only needs its own
                # diagonal factor (its updates all landed in the fused
                # trailing phases above)
                diag_panel(nb - 1)
        else:
            def step_k(k, _):
                diag_panel(k)
                trail_range(k, None, k + 1, nb, fused=False)
                return 0

            jax.lax.fori_loop(0, nb, step_k, 0)

        if fuse:
            cp = pltpu.make_async_copy(alpha_v, alpha_out, dsem)
            cp.start()
            cp.wait()

    return kernel


@functools.partial(
    jax.jit, static_argnames=("block_size", "interpret", "syrk", "mask"))
def _cholesky_pallas(K, block_size: int = 256, interpret: bool = False,
                     syrk: str = "hi", mask: bool = True):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = K.shape[0]
    bs = block_size
    rem = (-N) % bs
    if rem:
        # ONE fused pad pass + a rem-element diagonal scatter — the
        # previous zeros/at.set/at.set chain cost three N² passes
        # (~3 ms at N=10000, measured 2026-08-21)
        Kp = jax.lax.pad(K, jnp.zeros((), K.dtype),
                         [(0, rem, 0), (0, rem, 0)])
        idx = jnp.arange(N, N + rem)
        Kp = Kp.at[idx, idx].set(1.0)
    else:
        Kp = K
    Np = Kp.shape[0]
    nb = Np // bs

    out = pl.pallas_call(
        _make_chol_kernel(nb, bs, syrk=syrk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Np, Np), K.dtype),
        scratch_shapes=[
            pltpu.VMEM((bs, bs), K.dtype),      # diag
            pltpu.VMEM((bs, bs), K.dtype),      # zinv
            pltpu.VMEM((2, bs, bs), K.dtype),   # panel double buffer
            pltpu.VMEM((2, bs, bs), K.dtype),   # a double buffer
            pltpu.VMEM((2, bs, bs), K.dtype),   # b double buffer (per-j)
            pltpu.VMEM((2, bs, bs), K.dtype),   # c double buffer
            pltpu.SemaphoreType.DMA,            # generic
            pltpu.SemaphoreType.DMA((2,)),      # a load slots
            pltpu.SemaphoreType.DMA((2,)),      # b load slots
            pltpu.SemaphoreType.DMA((2,)),      # c load slots
            pltpu.SemaphoreType.DMA((2,)),      # panel load slots
            pltpu.SemaphoreType.DMA((2,)),      # panel write slots
            pltpu.SemaphoreType.DMA((2,)),      # c write slots
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True,
            # the scoped-VMEM default (16 MiB) is a compiler knob, not the
            # hardware: v5e cores have 128 MiB of VMEM. bs=512 scratch +
            # temporaries need ~17 MiB, bs=1024 ~40 MiB scratch + block
            # temporaries; give headroom so the fastest block size isn't
            # rejected at compile time
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(Kp)
    if not mask:
        # fast path for consumers that only read the lower triangle +
        # diagonal (triangular solves, logdet) — skips the N² slice+tril
        # pass (~1-1.5 ms at N=10k). The strictly-upper content is the
        # INPUT's upper triangle (in-place factorization), rows/cols
        # beyond N are the unit pad. Shape is the padded (Np, Np).
        return out
    return jnp.tril(out[:N, :N])


def _chol_vjp_bwd(res, g):
    # standard Cholesky VJP (Murray 2016), evaluated with XLA ops.
    # HIGHEST matmul: at TPU-default bf16 products this gradient differed
    # from XLA's AD by up to 0.5% (caught by the compiled-on-chip test
    # 2026-08-20); gradients feed line searches and NUTS energies, which
    # notice 2⁻⁹-level noise.
    # res may be the unmasked in-place factor (mask=False path): only
    # its lower triangle is the factor, so mask before use
    L = jnp.tril(res)
    from jax.scipy.linalg import solve_triangular

    def phi(A):
        return jnp.tril(A) - 0.5 * jnp.diag(jnp.diag(A))

    def _hmm(a, b):
        return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

    Lbar = jnp.tril(g)
    P = phi(_hmm(L.T, Lbar))
    S = solve_triangular(
        L, solve_triangular(L, P + P.T, lower=True, trans=1).T, lower=True,
        trans=1,
    )
    # Murray (2016): Σ̄ = ½ L⁻ᵀ (P + Pᵀ) L⁻¹, symmetrized
    Kbar = 0.25 * (S + S.T)
    # convention: full-matrix gradient, symmetric (matches jax.scipy usage
    # on symmetric inputs under symmetrization — see tests)
    return (Kbar,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def cholesky(K, block_size: int = 256, syrk: str = "hi",
             mask: bool = True):
    """Lower Cholesky via the Pallas blocked kernel (TPU compiled path).

    ``syrk`` picks the trailing-SYRK arithmetic — "hi" (Precision.HIGHEST,
    f32-exact), "s3"/"s4" (manual bf16 hi/lo operand split, 3/4 MXU
    passes), with a "d" suffix keeping DIAGONAL-block updates (the logdet
    path) at HIGHEST; the error bounds are documented in
    ``_make_chol_kernel`` and the measured accuracy/speed table lives in
    docs/PERFORMANCE.md. Accepts True/False as aliases for "s3"/"hi"
    (the pre-round-5 boolean API).
    """
    return _cholesky_pallas(K, block_size=block_size,
                            syrk=_norm_syrk(syrk), mask=mask)


def _norm_syrk(syrk):
    if syrk is True:
        return "s3"
    if syrk is False or syrk is None:
        return "hi"
    return syrk


def _fwd(K, block_size, syrk, mask):
    L = _cholesky_pallas(K, block_size=block_size, syrk=_norm_syrk(syrk),
                         mask=mask)
    return L, L


def _bwd(block_size, syrk, mask, res, g):
    # mask=False forwards return the PADDED factor, so res/g/K̄ are all
    # padded consistently; the caller differentiates through its own pad
    # op to recover the unpadded K̄.
    return _chol_vjp_bwd(res, g)


cholesky.defvjp(_fwd, _bwd)


def cholesky_interpret(K, block_size: int = 64, syrk: str = "hi"):
    """Interpret-mode execution for CPU equivalence tests."""
    return _cholesky_pallas(K, block_size=block_size, interpret=True,
                            syrk=_norm_syrk(syrk))


@functools.partial(
    jax.jit, static_argnames=("block_size", "interpret", "syrk"))
def _cholesky_solve_pallas(K, D, block_size: int = 512,
                           interpret: bool = False, syrk: str = "hi"):
    """Fused potrf+potrs on an ALREADY block-multiple (padded) system.

    K: (Np, Np) SPD, Np a multiple of ``block_size`` (callers pad with
    the unit-diagonal extension — Cholesky is leading-principal-nested);
    D: (Np, P) with zero pad rows. Returns ``(Lp, alpha, half_logdet)``
    where Lp is the UNMASKED in-place factor, ``alpha = L⁻¹ D`` (pad
    rows exactly zero), and ``half_logdet = Σ log diag Lp`` (pad rows
    contribute log 1 = 0).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Np = K.shape[0]
    bs = block_size
    assert Np % bs == 0, (Np, bs)
    P = D.shape[1]
    nb = Np // bs

    out, alpha, hld = pl.pallas_call(
        _make_chol_kernel(nb, bs, syrk=syrk, fuse_p=P),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((Np, Np), K.dtype),
                   jax.ShapeDtypeStruct((Np, P), K.dtype),
                   jax.ShapeDtypeStruct((1, 1), K.dtype)],
        scratch_shapes=[
            pltpu.VMEM((bs, bs), K.dtype),      # diag
            pltpu.VMEM((bs, bs), K.dtype),      # zinv
            pltpu.VMEM((2, bs, bs), K.dtype),   # panel double buffer
            pltpu.VMEM((2, bs, bs), K.dtype),   # a double buffer
            pltpu.VMEM((2, bs, bs), K.dtype),   # b double buffer (per-j)
            pltpu.VMEM((2, bs, bs), K.dtype),   # c double buffer
            pltpu.VMEM((Np, P), K.dtype),       # alpha (whole RHS)
            pltpu.SemaphoreType.DMA,            # generic
            pltpu.SemaphoreType.DMA((2,)),      # a load slots
            pltpu.SemaphoreType.DMA((2,)),      # b load slots
            pltpu.SemaphoreType.DMA((2,)),      # c load slots
            pltpu.SemaphoreType.DMA((2,)),      # panel load slots
            pltpu.SemaphoreType.DMA((2,)),      # panel write slots
            pltpu.SemaphoreType.DMA((2,)),      # c write slots
            pltpu.SemaphoreType.DMA,            # alpha in/out
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(K, D)
    return out, alpha, hld[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def cholesky_solve_logdet(K, D, block_size: int = 512, syrk: str = "hi"):
    """(half_logdet, quad) = (Σ log diag chol(K), ‖chol(K)⁻¹D‖²_F) via the
    fused potrf+potrs kernel. K must be padded to a block multiple with a
    unit-diagonal extension and D zero-padded (see
    ``linalg._pallas_logdet_quad``); both returned scalars are then exact
    for the leading system, no slicing required.
    """
    _, alpha, hld = _cholesky_solve_pallas(
        K, D, block_size=block_size, syrk=_norm_syrk(syrk))
    return hld, jnp.sum(jnp.square(alpha))


def _csl_fwd(K, D, block_size, syrk):
    Lp, alpha, hld = _cholesky_solve_pallas(
        K, D, block_size=block_size, syrk=_norm_syrk(syrk))
    return (hld, jnp.sum(jnp.square(alpha))), (Lp, alpha)


def _csl_bwd(block_size, syrk, res, cots):
    # ∂(½ logdet K)/∂K = ½ K⁻¹ ;  quad = DᵀK⁻¹D so ∂quad/∂K = −β βᵀ and
    # ∂quad/∂D = 2β with β = K⁻¹D = L⁻ᵀ α. Full-matrix symmetric-gradient
    # convention, matching ``cholesky``'s VJP (callers build K
    # symmetrically). All solves read only the lower triangle of the
    # unmasked Lp.
    from jax.scipy.linalg import solve_triangular

    Lp, alpha = res
    ghl, gq = cots
    beta = solve_triangular(Lp, alpha, lower=True, trans=1)
    eye = jnp.eye(Lp.shape[0], dtype=Lp.dtype)
    Linv = solve_triangular(Lp, eye, lower=True)
    Kinv = jnp.matmul(Linv.T, Linv,
                      precision=jax.lax.Precision.HIGHEST)
    Kbar = 0.5 * ghl * Kinv - gq * jnp.matmul(
        beta, beta.T, precision=jax.lax.Precision.HIGHEST)
    Dbar = 2.0 * gq * beta
    return Kbar, Dbar


cholesky_solve_logdet.defvjp(_csl_fwd, _csl_bwd)


def cholesky_solve_logdet_interpret(K, D, block_size: int = 64,
                                    syrk: str = "hi"):
    """Interpret-mode execution for CPU equivalence tests."""
    _, alpha, hld = _cholesky_solve_pallas(
        K, D, block_size=block_size, interpret=True,
        syrk=_norm_syrk(syrk))
    return hld, jnp.sum(jnp.square(alpha))
