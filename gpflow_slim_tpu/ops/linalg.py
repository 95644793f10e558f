"""Switchable dense linear algebra (the reference's tf.linalg role).

The reference delegates Cholesky/TRSM to TF's C++ kernels
(Eigen LLT / cuSOLVER). Here the correctness path is XLA's native
``cholesky``/``triangular_solve`` HLOs, and the performance path is the
Pallas (Mosaic) blocked kernels in ``ops.pallas_cholesky`` /
``ops.pallas_trsm``, selected by ``config.settings().use_pallas`` on TPU.
JAX supplies JVP/VJP rules for the XLA path; the Pallas path carries
``custom_vjp`` wrappers validated against it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cholesky as _xla_cholesky
from jax.scipy.linalg import solve_triangular as _xla_solve_triangular

from .. import config


def _pallas_active() -> bool:
    if not config.settings().use_pallas:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def cholesky(K):
    """Lower Cholesky factor of an SPD matrix."""
    if _pallas_active():
        import os

        from . import pallas_cholesky

        # bs=512 wins ≥~6k on v5e (DMA-bound SYRK likes the arithmetic
        # intensity: 8.4 ms vs XLA 11.4 at N=8192) but sits at the edge of
        # the 16 MiB scoped-VMEM budget and this environment's remote
        # compiler intermittently rejects it — default to the always-safe
        # 256 and let users opt in via GFS_PALLAS_CHOL_BS=512
        bs = int(os.environ.get("GFS_PALLAS_CHOL_BS", 256))
        return pallas_cholesky.cholesky(K, bs)
    return _xla_cholesky(K, lower=True)


def solve_lower(L, B):
    """Solve L x = B with L lower-triangular."""
    # thin RHS (e.g. the (N, P) targets of GPR, P small) can't feed the
    # MXU tiles the blocked kernel is built around — XLA's substitution
    # solve wins there; route Pallas only for wide RHS panels
    if _pallas_active() and B.ndim == 2 and B.shape[1] >= 128:
        from . import pallas_trsm

        return pallas_trsm.solve_lower(L, B)
    return _xla_solve_triangular(L, B, lower=True)


def solve_upper(U, B):
    """Solve U x = B with U upper-triangular."""
    if _pallas_active() and B.ndim == 2 and B.shape[1] >= 128:
        from . import pallas_trsm

        return pallas_trsm.solve_upper(U, B)
    return _xla_solve_triangular(U, B, lower=False)


def cho_solve_lower(L, B):
    """Solve (L Lᵀ) x = B given the lower Cholesky factor."""
    return solve_upper(L.T, solve_lower(L, B))


def robust_cholesky(K, max_tries: int = 5):
    """Cholesky with adaptive jitter escalation (GPyTorch-style).

    Tries ``chol(K + jitter·scale·I)`` with jitter growing ×10 per attempt
    (starting from the dtype-aware default) until the factor is finite —
    jittable via ``lax.while_loop``. Returns ``(L, jitter_used)``. The f32
    TPU safety net for ill-conditioned kernels; exact parity paths should
    call ``cholesky`` directly.
    """
    N = K.shape[0]
    eye = jnp.eye(N, dtype=K.dtype)
    scale = jnp.mean(jnp.diagonal(K))
    base = jnp.asarray(config.default_jitter(), K.dtype)

    def attempt(jit_rel):
        L = cholesky(K + jit_rel * scale * eye)
        ok = jnp.all(jnp.isfinite(L))
        return L, ok

    def cond(state):
        _, ok, tries, _ = state
        return jnp.logical_and(jnp.logical_not(ok), tries < max_tries)

    def body(state):
        jit_rel, _, tries, _ = state
        jit_rel = jit_rel * 10.0
        L, ok = attempt(jit_rel)
        return (jit_rel, ok, tries + 1, L)

    L0, ok0 = attempt(base)
    jit_rel, ok, _, L = jax.lax.while_loop(
        cond, body, (base, ok0, jnp.asarray(0, jnp.int32), L0)
    )
    return L, jit_rel * scale
