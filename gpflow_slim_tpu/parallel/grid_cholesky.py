"""2-D (rows × cols) mesh distributed block Cholesky.

The TP-analog completion of SURVEY §2.2: the N×N Gram lives block-cyclic
over a 2-D device grid — block (i, j) on device (i mod Pr, j mod Pc) — so
per-device memory is O(N²/(Pr·Pc)) and the O(N³/3) SYRK flops are spread
over the full grid (the 1-D paths in ``cyclic_cholesky``/``dist_linalg``
spread flops over P devices but each holds O(N²/P) and panel work
serializes per column owner).

Per step k (right-looking):
  1. block column k is assembled r-sharded with one masked ``psum`` over
     the col axis (only mesh column k mod Pc contributes);
  2. the bs×bs diagonal block is replicated with a masked ``psum`` over the
     row axis; every device factors it redundantly (O(bs³) — cheaper than a
     broadcast round-trip) and inverts the triangle so the panel TRSM is a
     GEMM;
  3. each device TRSMs its own panel rows and mesh column k mod Pc writes
     the result back;
  4. the masked panel is ``all_gather``ed along the row axis so each device
     can look up the L_jk blocks for the columns IT owns (block-cyclic
     index arithmetic), then one local GEMM applies the trailing update to
     its (R_loc·bs × C_loc·bs) tile.

Communication per step per device: one bs-wide panel psum + one (N, bs)
all-gather — O(N·bs); O(N²) over the factorization, matching the 1-D
schedule while scaling memory/flops by the full grid size. (A
communication-optimal O(N²/√P) schedule would broadcast panels only along
single mesh rows/cols — tracked as a next step in PERFORMANCE.md.)

Layout note: the block-cyclic permutation is applied host-side around the
shard_map call (same convention as ``cyclic_cholesky``); the public
function takes and returns ordinary (N, N) arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["grid_cholesky"]

_HP = jax.lax.Precision.HIGHEST  # TRSM/SYRK subtract nearly-equal terms
               # (PERFORMANCE.md precision policy); bf16 default passes can
               # push small pivots negative on TPU f32


def _cyclic_order(nb, p):
    return np.concatenate([np.arange(d, nb, p) for d in range(p)])


def grid_cholesky(K, mesh: Mesh, axes=("rows", "cols"),
                  block_size: int = 128):
    """Lower Cholesky of SPD K over a 2-D mesh; returns the full (N, N)
    lower factor (replicated). N/block_size must divide both axis sizes."""
    r_ax, c_ax = axes
    Pr, Pc = mesh.shape[r_ax], mesh.shape[c_ax]
    N = K.shape[0]
    bs = block_size
    if N % bs:
        raise ValueError(f"N={N} not divisible by block_size={bs}")
    nb = N // bs
    if nb % Pr or nb % Pc:
        raise ValueError(f"nb={nb} must divide by mesh axes ({Pr},{Pc})")
    R_loc, C_loc = nb // Pr, nb // Pc

    # host-side block-cyclic permutation of rows and columns
    row_order = _cyclic_order(nb, Pr)
    col_order = _cyclic_order(nb, Pc)
    row_perm = (row_order[:, None] * bs + np.arange(bs)[None, :]).ravel()
    col_perm = (col_order[:, None] * bs + np.arange(bs)[None, :]).ravel()
    inv_row = np.argsort(row_perm)
    inv_col = np.argsort(col_perm)

    Kp = K[row_perm][:, col_perm]

    eye = jnp.eye(bs, dtype=K.dtype)

    def local(Ka):
        # Ka: (R_loc·bs, C_loc·bs) — my block-cyclic tile
        r = jax.lax.axis_index(r_ax)
        c = jax.lax.axis_index(c_ax)
        # host permutation laid blocks out device-major, so device r's
        # local row slot s holds global block row r + Pr·s (same for cols)
        my_rows = r + Pr * jnp.arange(R_loc)          # (R_loc,) global blk
        row_ids = jnp.repeat(my_rows, bs)             # (R_loc·bs,)

        def step(k, Ka):
            kc_owner = jnp.equal(c, jnp.mod(k, Pc))
            jc = k // Pc  # local column slot on the owner column

            # 1) assemble my r-shard of block column k (masked psum over c)
            col_slice = jax.lax.dynamic_slice(
                Ka, (0, jc * bs), (R_loc * bs, bs)
            )
            colblk = jax.lax.psum(
                jnp.where(kc_owner, col_slice, 0.0), c_ax
            )  # (R_loc·bs, bs)

            # 2) replicate the diagonal block (masked psum over r)
            is_diag_row = jnp.equal(row_ids, k)[:, None]  # (R_loc·bs, 1)
            # project my diag rows into a dense (bs, bs) via one-hot matmul
            pos_in_block = jnp.mod(jnp.arange(R_loc * bs), bs)
            onehot = (
                is_diag_row
                * (pos_in_block[:, None] == jnp.arange(bs)[None, :])
            ).astype(Ka.dtype)  # (R_loc·bs, bs)
            diag = jax.lax.psum(onehot.T @ colblk, r_ax)  # (bs, bs)

            Lkk = jnp.linalg.cholesky(diag)
            Zinv = jax.scipy.linalg.solve_triangular(Lkk, eye, lower=True)

            # 3) panel TRSM on my rows: i>k → A_ik·L_kkᵀ⁻¹; i==k → L_kk;
            #    i<k → already-final values stay
            below = (row_ids > k)[:, None]
            trsm = jnp.matmul(colblk, Zinv.T, precision=_HP)
            Lkk_rows = onehot @ Lkk  # scatter L_kk into my diag rows
            newcol = jnp.where(below, trsm,
                               jnp.where(is_diag_row, Lkk_rows, colblk))
            Ka = jnp.where(
                kc_owner,
                jax.lax.dynamic_update_slice(Ka, newcol, (0, jc * bs)),
                Ka,
            )

            # 4) trailing update with the masked panel
            Lmask = jnp.where(below, newcol, 0.0)  # (R_loc·bs, bs)
            full_panel = jax.lax.all_gather(Lmask, r_ax)
            # (Pr, R_loc·bs, bs) → block lookup table (Pr·R_loc, bs, bs)
            table = full_panel.reshape(Pr, R_loc, bs, bs).reshape(
                Pr * R_loc, bs, bs
            )
            my_cols = c + Pc * jnp.arange(C_loc)  # global blk col indices
            idx = jnp.mod(my_cols, Pr) * R_loc + my_cols // Pr
            Lc = jnp.take(table, idx, axis=0)  # (C_loc, bs, bs) = L_jk
            Lc_flat = Lc.reshape(C_loc * bs, bs)
            return Ka - jnp.matmul(Lmask, Lc_flat.T, precision=_HP)

        Ka = jax.lax.fori_loop(0, nb, step, Ka)
        return Ka

    Lp = shard_map(
        local, mesh=mesh, in_specs=P(r_ax, c_ax),
        out_specs=P(r_ax, c_ax), check_vma=False,
    )(Kp)
    return jnp.tril(Lp[inv_row][:, inv_col])
