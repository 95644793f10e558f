"""Misc helpers (ref:gpflowSlim/misc.py — shape helpers, name_scope decor).

JAX analogs: ``named_scope`` profiling annotations (XProf attribution for
the gram/chol/leapfrog regions, SURVEY §5 tracing), determinism check, and
a NaN-guard toggle.
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np

__all__ = ["named_scope", "debug_nans", "check_determinism", "print_summary"]


def named_scope(name: str):
    """Profiler annotation context (jax.named_scope passthrough)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """NaN-guard debug mode (SURVEY §5 'race detection' analog)."""
    old = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def check_determinism(fn, *args, reps: int = 2) -> bool:
    """Same inputs ⇒ bit-identical outputs (determinism check, SURVEY §5)."""
    outs = [jax.device_get(fn(*args)) for _ in range(reps)]
    flat0 = jax.tree_util.tree_leaves(outs[0])
    for o in outs[1:]:
        for a, b in zip(flat0, jax.tree_util.tree_leaves(o)):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                return False
    return True


def print_summary(model, max_width: int = 100):
    """GPflow-style parameter table for any Module tree."""
    import numpy as np

    from ..params import parameters

    rows = [("name", "transform", "prior", "trainable", "shape", "value")]
    for name, p in parameters(model):
        val = np.asarray(p.value)
        if val.size <= 4:
            vstr = np.array2string(val, precision=4, suppress_small=True)
        else:
            vstr = f"[{val.size} values] mean={val.mean():.4g}"
        rows.append((
            name,
            type(p.transform).__name__,
            type(p.prior).__name__ if p.prior is not None else "-",
            str(p.trainable),
            str(tuple(val.shape)),
            vstr.replace("\n", " "),
        ))
    widths = [min(max(len(r[i]) for r in rows), max_width)
              for i in range(len(rows[0]))]
    lines = []
    for j, r in enumerate(rows):
        lines.append("  ".join(c[:w].ljust(w) for c, w in zip(r, widths)))
        if j == 0:
            lines.append("  ".join("-" * w for w in widths))
    out = "\n".join(lines)
    print(out)
    return out
