"""Checkpoint / resume (SURVEY §5).

The reference gets checkpointing for free because every Param is a named
``tf.get_variable`` restorable by ``tf.train.Saver``. The pytree analog:
models/optimizer states are ordinary pytrees, serialized with flax's
msgpack (arrays by value, structure from a template). Recovery story for
gang-scheduled TPU jobs = restart from the last checkpoint.

``save_checkpoint(path, tree)`` / ``load_checkpoint(path, template)`` for
any pytree (model, ``(model, opt_state, step)``, HMC/NUTS chain state…).
Atomic write (tmp + rename) so a preempted job never sees a torn file.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]


def save_checkpoint(path: str, tree, step: int | None = None) -> str:
    """Serialize a pytree to ``path`` (msgpack). Returns the final path.

    With ``step``, writes ``{path}-{step}`` (keeps a numbered history).
    """
    if step is not None:
        path = f"{path}-{step}"
    # custom pytree nodes (Module/Param) are not msgpack-able; serialize the
    # leaf list — the template supplies the structure on load
    leaves = jax.tree_util.tree_leaves(jax.device_get(tree))
    data = serialization.to_bytes(leaves)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, template):
    """Restore a pytree from ``path`` using ``template`` for structure.

    The template supplies static metadata (transforms, priors, shapes);
    array leaves are replaced by the stored values.
    """
    with open(path, "rb") as f:
        data = f.read()
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    leaves = serialization.from_bytes(t_leaves, data)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latest_checkpoint(path: str) -> str | None:
    """Highest-numbered ``{path}-{step}`` file, or ``path`` itself."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    base = os.path.basename(path)
    best, best_step = None, -1
    if os.path.exists(path):
        best = path
    if os.path.isdir(d):
        for name in os.listdir(d):
            if name.startswith(base + "-"):
                try:
                    step = int(name[len(base) + 1 :])
                except ValueError:
                    continue
                if step > best_step:
                    best, best_step = os.path.join(d, name), step
    return best
