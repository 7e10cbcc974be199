"""Orbax checkpointing of {params, opt_state, step, epoch, rng}.

The reference pickles the entire ``nn.Module`` with no optimizer state and
no resume path (``/root/reference/src/trainer/base.py:302-308``,
``eval_utils.py:62``; SURVEY.md §5). Here checkpoints are proper pytrees so
training can resume exactly, and the ``model_best``/``model_last`` naming +
best-on-eval-R² selection semantics are preserved.

Layout under ``log_dir``::

    model_best/   orbax pytree checkpoint
    model_last/
    model_best.json  {"epoch": ..., "step": ..., "metric": ...}
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(log_dir: str, name: str, tree: Dict[str, Any],
                    meta: Optional[Dict[str, Any]] = None) -> str:
    """Save a pytree checkpoint as ``<log_dir>/model_<name>/`` (atomic)."""
    path = os.path.abspath(os.path.join(log_dir, f"model_{name}"))
    ckptr = ocp.StandardCheckpointer()
    tree = jax.device_get(tree)
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump({k: _jsonable(v) for k, v in meta.items()}, f)
    return path


def restore_checkpoint(log_dir: str, name: str,
                       target: Optional[Dict[str, Any]] = None
                       ) -> Dict[str, Any]:
    """Restore ``<log_dir>/model_<name>/``; ``target`` supplies the pytree
    structure/shardings (pass an abstract or concrete example tree)."""
    path = os.path.abspath(os.path.join(log_dir, f"model_{name}"))
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)


def load_checkpoint_meta(log_dir: str, name: str) -> Optional[Dict[str, Any]]:
    path = os.path.join(log_dir, f"model_{name}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _jsonable(v):
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if isinstance(v, jax.Array):
        return np.asarray(v).item()
    return v
