"""2-D (rows × cols) mesh distributed block Cholesky — replicated-output
convenience wrapper.

The real algorithm lives in ``grid_gpr`` (``grid_cholesky_tiles``): the
N×N matrix is block-cyclic over a 2-D device grid — block (i, j) on
device (i mod Pr, j mod Pc) — per-device memory O(N²/(Pr·Pc)), the
O(N³/3) SYRK flops spread over the full grid. See ``grid_gpr`` for the
per-step schedule and communication analysis, and for the END-TO-END
sharded pipeline (sharded Gram → in-layout factor → sharded solves →
scalar loss) that never replicates anything N×N.

This wrapper takes and returns ordinary (N, N) arrays (host-side
block-cyclic permutation around the sharded factorization), replicating
the factor at the output boundary — convenient for tests and for callers
that need the dense L, NOT the memory-scaling path. Use
``grid_gpr.make_grid_gpr_loss`` / ``grid_cholesky_tiles`` to stay sharded.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from .grid_gpr import GridLayout, grid_cholesky_tiles

__all__ = ["grid_cholesky"]


def grid_cholesky(K, mesh: Mesh, axes=("rows", "cols"),
                  block_size: int = 128):
    """Lower Cholesky of SPD K over a 2-D mesh; returns the full (N, N)
    lower factor (replicated). N/block_size must divide both axis sizes."""
    layout = GridLayout(K.shape[0], mesh, axes=axes, block_size=block_size)
    row_perm = layout.row_perm()
    col_perm = layout.col_perm()
    Kp = K[row_perm][:, col_perm]
    Lp = grid_cholesky_tiles(Kp, layout)
    inv_row = np.argsort(row_perm)
    inv_col = np.argsort(col_perm)
    return jnp.tril(Lp[inv_row][:, inv_col])
