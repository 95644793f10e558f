"""Measured per-shape routing between XLA and the Pallas linalg kernels.

Why this exists (round-3 verdict #1): the Pallas blocked Cholesky beat
XLA's native Cholesky by 25-35% at N=4096-8192 in one session, then LOST by
~15-25% at N=10000 in another — while ``ops.linalg`` routed on static
thresholds ("hope"). Static thresholds cannot survive a remote runtime
whose compiler and absolute throughput both drift between sessions. This
module decides per shape by MEASUREMENT, in priority order:

1. ``GFS_PALLAS_CHOL_BS`` env pin — ``0`` forces XLA, any other value
   forces that Pallas block size (no probe, no fallback);
2. the in-process cache of previous decisions;
3. a timing probe at first use of a shape (default on TPU, disable with
   ``GFS_AUTOTUNE=0``): time XLA and each *compilable* Pallas candidate on
   synthetic input at the exact (N, dtype) — R factorizations inside one
   ``lax.scan`` with a per-iteration perturbation (the remote runtime
   memoizes identical dispatches and its dispatch latency is ~20 ms, so
   only scan-amortized fresh-seed timing is trustworthy), min-of-2 calls.
   Pallas must win by >5% (hysteresis: ties go to XLA, which keeps the op
   fusable into the surrounding computation);
4. with ``GFS_AUTOTUNE=0``: a static table measured on v5e 2026-08-20
   (benchmarks/bench_chol_scan.py, recorded in docs/PERFORMANCE.md).

The probe costs one compile per candidate per shape, paid once per
process; results are cached by (backend, N, dtype).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

# (backend, N, dtype-name, allowed-split-modes) -> (block_size, syrk_mode)
# tuple for the Pallas kernel, or None for XLA
_CHOICE_CACHE: dict = {}

_PROBE_REPS = 4
_PROBE_CALLS = 2
# Pallas must beat XLA by this factor to be chosen: a tie should go to the
# native HLO, which XLA can schedule/fuse with the surrounding graph.
_HYSTERESIS = 0.95

# Static fallback (GFS_AUTOTUNE=0): measured on v5e, 2026-08-20, scan-
# amortized fresh-seed timing (benchmarks/bench_chol_scan.py; table in
# docs/PERFORMANCE.md). XLA won at every N in {2048..12288} that session,
# so the no-probe default is XLA everywhere; the kernels stay reachable
# via the env pin and the probe. Entries, if ever added, map
# N -> (block_size, syrk_mode) — the same tuple shape the cache holds.
_STATIC_CHOL_TABLE: dict = {}


def use_pallas_gram_lower() -> bool:
    """Whether Cholesky-bound Grams use the lower-triangle-only Pallas
    kernel (``pallas_gram.stationary_gram_lower``). The kernel skips the
    d²-expansion + map on strictly-upper tiles, but measured 2026-08-20 at
    N=10000 (scan-amortized) it does NOT pay: 4.09 ms vs 4.04 ms for the
    full XLA composite — per-tile pipeline overhead and the output-tile
    DMA (written for every tile either way) dominate the gram, not the
    elementwise map. Measured default: OFF. ``GFS_PALLAS_GRAM_LOWER=1``
    pins it on; the kernel and its K_lower plumbing stay in place for a
    future packed-layout factorization that could skip upper-tile WRITES
    too (the actual bottleneck).
    """
    return os.environ.get(
        "GFS_PALLAS_GRAM_LOWER", "0") not in ("0", "false", "")


def _autotune_enabled() -> bool:
    env = os.environ.get("GFS_AUTOTUNE")
    if env is not None:
        return env not in ("0", "false", "")
    return True


def _split_modes() -> tuple:
    """Extra split-bf16 SYRK modes the probe may consider (see
    pallas_cholesky._make_chol_kernel for the mode glossary).

    The 3-pass split ("s3", logdet ~4e-5 rel err) stays opt-in via
    ``GFS_PALLAS_CHOL_SPLIT3=1`` or ``GFS_PALLAS_CHOL_SPLIT=s3,...`` —
    a silent switch to it would change numerics. Which (if any) split
    modes sit in the DEFAULT candidate list is an accuracy-measured
    decision recorded in docs/PERFORMANCE.md.
    """
    env = os.environ.get("GFS_PALLAS_CHOL_SPLIT")
    modes = []
    if env:
        modes += [m.strip() for m in env.split(",") if m.strip()]
    if os.environ.get("GFS_PALLAS_CHOL_SPLIT3", "0") not in (
            "0", "false", ""):
        modes.append("s3")
    return tuple(dict.fromkeys(modes))  # de-dup, keep order


# Default probe candidates. "s4" (4-pass split-bf16 SYRK) is in the
# DEFAULT set because it is measurably *more* accurate than XLA's own f32
# Cholesky at the stress shape — real short-lengthscale RBF Gram,
# N=10240, 2026-08-21: logdet rel err 6.9e-7 (s4) vs 1.5e-6 (XLA) vs
# 1.2e-7 (6-pass "hi"), while running ~12% faster than XLA (20.4 vs
# 23.1 ms) — so routing to it keeps the 1e-6-class accuracy story AND
# wins the probe. The 3-pass "s3" (4e-5 logdet) stays opt-in.
_DEFAULT_SYRK_MODES = ("s4x2", "s4")


def _candidates():
    # each candidate costs one pipeline compile (~20-40 s on the remote
    # tunnel) at first use of a shape, so the default list is the two
    # measured contenders: the two-panel and classic 4-pass-split
    # schedules (2026-08-21 sweep: every "hi"/bs=256 variant lost to one
    # of these at every N, and to XLA below ~6k). The full variant space
    # stays reachable via GFS_PALLAS_CHOL_SPLIT / GFS_PALLAS_CHOL_BS.
    env = os.environ.get("GFS_PALLAS_CHOL_BS")
    if env:
        return None  # pin handled by caller
    base = [(512, m) for m in _split_modes()]
    base += [(512, m) for m in _DEFAULT_SYRK_MODES]
    return tuple(base)


def _run_outside_trace(fn, *args):
    """Run ``fn(*args)`` in a worker thread: trace state is thread-local,
    so device work executes eagerly even when the caller sits inside an
    active jit trace."""
    import threading

    out: dict = {}

    def run():
        try:
            out["v"] = fn(*args)
        except BaseException as e:  # re-raised in the caller
            out["e"] = e

    t = threading.Thread(target=run)
    t.start()
    t.join()
    if "e" in out:
        raise out["e"]
    return out["v"]


def _probe_time(fn, x0, seed0):
    """min-of-_PROBE_CALLS seconds for one scan-amortized execution.

    Completion is forced with ``float()`` (a device_get), NOT
    ``block_until_ready`` — on the remote-tunnel runtime the latter can
    return before execution finishes (measured: 0.06 "ms" for an N=4096
    factorization), which would make every probe a dispatch-latency
    coin flip.
    """
    float(fn(x0, jnp.float32(seed0)))  # compile + warm
    best = float("inf")
    for t in range(_PROBE_CALLS):
        t0 = time.perf_counter()
        float(fn(x0, jnp.float32(seed0 + 3.0 * (t + 1))))
        best = min(best, time.perf_counter() - t0)
    return best


def _measure_chol(N, dtype):
    """Time XLA vs compilable Pallas candidates at (N, dtype); return the
    winning block size or None for XLA.

    What is timed is the logdet+quad PIPELINE each route actually runs in
    the exact-GPR objective (``linalg._pallas_logdet_quad`` /
    ``_xla_logdet_quad``) — the Pallas route's padding and mask-free
    consumption are part of its cost/benefit, and probing the standalone
    masked factorization mis-routed non-multiple N by ~the mask+pad cost
    (measured 2026-08-21 at N=10000: standalone said XLA, the pipeline
    says Pallas s4).
    """
    from . import linalg

    # synthetic SPD input: well-conditioned; dense-Cholesky timing is
    # data-independent, so the trivial matrix times identically to a Gram
    K0 = 2.0 * jnp.eye(N, dtype=dtype)
    D0 = jnp.ones((N, 1), dtype)

    def scan_pipeline(impl):
        @jax.jit
        def many(K, seed):
            def body(carry, i):
                hl, quad = impl(K + (seed * 1e-9 + 1e-8 * (i + 1))
                                * jnp.eye(N, dtype=K.dtype))
                return carry + hl + 1e-6 * quad, None

            total, _ = jax.lax.scan(
                body, jnp.zeros((), dtype), jnp.arange(_PROBE_REPS))
            return total

        return many

    times = {}
    times[None] = _probe_time(
        scan_pipeline(lambda K: linalg._xla_logdet_quad(K, D0)), K0, 11.0)
    for bs, mode in _candidates() or ():
        pipe = lambda K, b=bs, s=mode: linalg._pallas_logdet_quad(
            K, D0, b, s)
        try:
            jax.jit(pipe).lower(
                jax.ShapeDtypeStruct((N, N), dtype)).compile()
        except Exception:  # compile rejection — candidate unavailable
            continue
        times[(bs, mode)] = _probe_time(scan_pipeline(pipe), K0, 29.0)

    xla_t = times[None]
    pallas = {c: t for c, t in times.items() if c is not None}
    if pallas:
        best = min(pallas, key=pallas.get)
        if pallas[best] < _HYSTERESIS * xla_t:
            return best, times
    return None, times


def chol_choice(N, dtype):
    """Routing for an (N, N) Cholesky: ``(block_size, syrk_mode)`` for
    the Pallas kernel, or None for XLA.

    Callers have already applied the cheap static gates (TPU backend, f32,
    N above the minimum) — this resolves pin → cache → probe → table.
    Env pin: ``GFS_PALLAS_CHOL_BS=0`` forces XLA, ``512`` that block
    size at the exact ("hi") SYRK, ``512s3``/``512s4``/``512s3d``/
    ``512s4d`` the split-bf16 SYRK variants.
    """
    env = os.environ.get("GFS_PALLAS_CHOL_BS")
    if env:
        import re

        m = re.fullmatch(
            r"(\d+)((?:hi|s3d|s4d|s3|s4)(?:x2)?)?", env.strip())
        if m is None:
            # a typo in the pin must not take down the computation —
            # fall through to the probe/cache path below
            print(
                f"# gfs: unparseable GFS_PALLAS_CHOL_BS={env!r} "
                "(want e.g. 0, 512, 512s3, 512s4d) — ignoring the pin",
                file=sys.stderr,
                flush=True,
            )
        else:
            bs = int(m.group(1))
            return None if bs == 0 else (bs, m.group(2) or "hi")

    key = (jax.default_backend(), int(N), jnp.dtype(dtype).name,
           _split_modes())
    if key in _CHOICE_CACHE:
        return _CHOICE_CACHE[key]

    if not _autotune_enabled():
        choice = _STATIC_CHOL_TABLE.get(int(N))
    else:
        try:
            # the first cholesky call almost always happens INSIDE an
            # outer jit trace (objective tracing): jnp ops here would be
            # staged into that trace as tracers (probe dies), and
            # jax.ensure_compile_time_eval constant-folds the probe's
            # N×N operand into the compile request (HTTP 413 from the
            # remote compiler, observed 2026-08-21). JAX trace state is
            # thread-local, so a worker thread runs the probe eagerly
            # with ordinary argument-passing compiles.
            choice, times = _run_outside_trace(
                _measure_chol, int(N), dtype)

            def _nm(k):
                if k is None:
                    return "xla"
                bs, mode = k
                return f"pallas{bs}" + ("" if mode == "hi" else mode)

            summary = {
                _nm(k): round(v * 1e3 / _PROBE_REPS, 2)
                for k, v in times.items()
            }
            print(
                f"# gfs autotune cholesky N={N} {jnp.dtype(dtype).name}: "
                f"{summary} ms/op -> {_nm(choice)}",
                file=sys.stderr,
                flush=True,
            )
        except Exception as e:  # probe failure must never take the program
            print(
                f"# gfs autotune cholesky N={N}: probe failed "
                f"({type(e).__name__}: {e}) -> xla",
                file=sys.stderr,
                flush=True,
            )
            choice = None
    _CHOICE_CACHE[key] = choice
    return choice


# ---------------------------------------------------------------------------
# Generic per-shape probe: one mechanism for every routed kernel
# (VERDICT r4 #5 — the wide/batched TRSM and the gram previously used
# measured-once static gates while the Cholesky probed; now all four
# resolve pin -> cache -> probe -> static default, sharing the same
# scan-amortized fresh-seed timing and the same ties-go-to-XLA
# hysteresis. Static thresholds survive only as probe-SKIP fast paths
# for shapes that cannot win by construction.)
# ---------------------------------------------------------------------------

_OP_CACHE: dict = {}


def _probe_impls(tag, key, impls, make_args, hysteresis):
    """Time each impl (name -> fn(args..., i_scalar)) at ``key``; return
    the winning non-"xla" name if it beats "xla" by ``hysteresis``, else
    None. Candidates that fail to compile OR die at runtime during the
    probe are skipped (compile/runtime-reject fallback)."""
    args = make_args()

    def scan_runner(fn):
        @jax.jit
        def many(args, seed):
            def body(carry, i):
                out = fn(*args, seed * 1e-9 + 1e-6 * (i + 1))
                return carry + out, None

            total, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), jnp.arange(_PROBE_REPS))
            return total

        return many

    times = {}
    for name, fn in impls.items():
        try:
            times[name] = _probe_time(scan_runner(fn), args, 11.0)
        except Exception:  # compile/runtime rejection — skip candidate
            continue
    if "xla" not in times:
        return None
    xla_t = times.pop("xla")
    choice = None
    if times:
        best = min(times, key=times.get)
        if times[best] < hysteresis * xla_t:
            choice = best
    summary = {"xla": round(xla_t * 1e3 / _PROBE_REPS, 2)}
    summary.update(
        {n: round(v * 1e3 / _PROBE_REPS, 2) for n, v in times.items()})
    print(
        f"# gfs autotune {tag} {key}: {summary} ms/op -> "
        f"{choice or 'xla'}",
        file=sys.stderr,
        flush=True,
    )
    return choice


def _op_choice(tag, key, env_pin, impls_builder, make_args,
               hysteresis=_HYSTERESIS):
    pin = os.environ.get(env_pin)
    if pin is not None and pin != "":
        if pin in ("0", "false"):
            return None
        if pin in ("1", "true"):
            return "pallas"
    full_key = (tag, jax.default_backend()) + key
    if full_key in _OP_CACHE:
        return _OP_CACHE[full_key]
    if not _autotune_enabled():
        choice = None  # measured static default: XLA (docs/PERFORMANCE.md)
    else:
        try:
            choice = _run_outside_trace(
                _probe_impls, tag, key, impls_builder(), make_args,
                hysteresis)
        except Exception as e:  # probe failure must never take the program
            print(
                f"# gfs autotune {tag} {key}: probe failed "
                f"({type(e).__name__}: {e}) -> xla",
                file=sys.stderr,
                flush=True,
            )
            choice = None
    _OP_CACHE[full_key] = choice
    return choice


def trsm_wide_choice(M, C, dtype):
    """Routing for a single lower-triangular solve L (M,M) with a WIDE
    RHS (M, C): "pallas" for the blocked Mosaic TRSM, None for XLA.

    Probe-skip fast path: C < 128 cannot fill an MXU tile row, so thin
    RHS goes straight to XLA substitution without paying a probe.
    Pin: ``GFS_PALLAS_TRSM`` (0 = XLA, 1 = Pallas).
    """
    if C < 128:
        return None

    def impls():
        from jax.scipy.linalg import solve_triangular

        from . import pallas_trsm

        def xla(L, B, eps):
            out = solve_triangular(L, B + eps, lower=True)
            return jnp.sum(out[-1, -64:])

        def pallas(L, B, eps):
            out = pallas_trsm.solve_lower(L, B + eps)
            return jnp.sum(out[-1, -64:])

        return {"xla": xla, "pallas": pallas}

    def make_args():
        L = jnp.eye(M, dtype=dtype) * 2.0 + 0.01 * jnp.tril(
            jnp.ones((M, M), dtype), -1)
        B = jnp.ones((M, C), dtype)
        return (L, B)

    return _op_choice("trsm_wide", (int(M), int(C), jnp.dtype(dtype).name),
                      "GFS_PALLAS_TRSM", impls, make_args)


def trsm_batched_choice(P, M, dtype):
    """Routing for batched triangular solves L (P,M,M) X = B (P,M,M):
    "pallas" for the grid kernel, None for vmapped XLA substitution.
    Pin: ``GFS_PALLAS_BATCHED_TRSM`` (0 = XLA, 1 = Pallas)."""

    def impls():
        from jax.scipy.linalg import solve_triangular

        from . import pallas_trsm

        def xla(L, B, eps):
            out = jax.vmap(
                lambda l, b: solve_triangular(l, b, lower=True)
            )(L, B + eps)
            return jnp.sum(out[-1, -1, -64:])

        def pallas(L, B, eps):
            out = pallas_trsm.batched_solve_lower(L, B + eps)
            return jnp.sum(out[-1, -1, -64:])

        return {"xla": xla, "pallas": pallas}

    def make_args():
        L = jnp.tile(
            (jnp.eye(M, dtype=dtype) * 2.0)[None], (P, 1, 1))
        B = jnp.ones((P, M, M), dtype)
        return (L, B)

    return _op_choice(
        "trsm_batched", (int(P), int(M), jnp.dtype(dtype).name),
        "GFS_PALLAS_BATCHED_TRSM", impls, make_args)


# The fused Pallas gram must beat the XLA composite by MORE than the
# plain hysteresis to win: inside real objectives the composite fuses
# into neighboring elementwise ops (noise-add, consumers), worth ~7%
# measured (bench_ab.py, 2026-08-20) — a standalone probe cannot see
# that, so the bar prices it in.
_GRAM_HYSTERESIS = 0.85


def gram_choice(N, M, D, kind, dtype):
    """Routing for a stationary Gram K(X, X2): "pallas" for the fused
    tile kernel, None for the XLA composite.
    Pin: ``GFS_PALLAS_GRAM`` (0 = XLA, 1 = Pallas).

    Probe-skip fast path: small Grams (N·M < 4M entries — every measured
    session has the composite ahead there, and predict paths generate
    many distinct small shapes) go straight to the composite without
    paying a probe compile.
    """
    if N * M < 4_000_000 and not os.environ.get("GFS_PALLAS_GRAM"):
        return None

    def impls():
        from . import pallas_gram

        def xla(Xs, X2s, eps):
            out = pallas_gram._gram_reference(
                kind, Xs + eps, X2s, jnp.asarray(1.3, dtype))
            return jnp.sum(out[-1, -64:])

        def pallas(Xs, X2s, eps):
            out = pallas_gram.stationary_gram(
                kind, Xs + eps, X2s, jnp.asarray(1.3, dtype))
            return jnp.sum(out[-1, -64:])

        return {"xla": xla, "pallas": pallas}

    def make_args():
        kx = jax.random.PRNGKey(0)
        Xs = jax.random.uniform(kx, (N, D), dtype)
        X2s = jax.random.uniform(kx, (M, D), dtype)
        return (Xs, X2s)

    return _op_choice(
        "gram", (int(N), int(M), int(D), kind, jnp.dtype(dtype).name),
        "GFS_PALLAS_GRAM", impls, make_args,
        hysteresis=_GRAM_HYSTERESIS)
