"""Checkpoint backends.

Two interchangeable formats:
  * 'pickle' (default): single-file full state — the shape of the
    reference's torch.save checkpoints (`trainer.py:294-317`), fine for
    replicated single-host params.
  * 'orbax': directory-based sharded checkpointing — required for
    row-sharded tables on multi-host meshes (each host writes its shards;
    restore re-shards onto the current mesh).

Selected by `config['checkpoint_format']`.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_pickle(path: str, state: Dict[str, Any]) -> None:
    with open(path, "wb") as f:
        pickle.dump(state, f)


def load_pickle(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


class OrbaxCheckpointer:
    """Thin orbax StandardCheckpointer wrapper for sharded pytrees."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, name: str, tree) -> str:
        import orbax.checkpoint as ocp

        path = os.path.join(self.directory, name)
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        self._ckptr.save(path, tree)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, name: str, template):
        path = os.path.join(self.directory, name)
        return self._ckptr.restore(path, template)


def save_checkpoint(
    path: str,
    state: Dict[str, Any],
    fmt: str = "pickle",
    sharded_trees: Optional[Dict[str, Any]] = None,
) -> None:
    """Save `state` (host-serializable) and optionally sharded pytrees.

    With fmt='orbax', `sharded_trees` (e.g. {'params': ..., 'opt_state': ...})
    go through orbax (device shards written in place); the rest of `state`
    stays a sidecar pickle.
    """
    if fmt == "orbax" and sharded_trees:
        ck = OrbaxCheckpointer(path + ".orbax")
        for name, tree in sharded_trees.items():
            ck.save(name, tree)
        meta = dict(state)
        meta["__orbax__"] = sorted(sharded_trees)
        save_pickle(path, meta)
    else:
        save_pickle(path, state)


def load_checkpoint(
    path: str, templates: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    state = load_pickle(path)
    names = state.get("__orbax__")
    if names and templates:
        ck = OrbaxCheckpointer(path + ".orbax")
        for name in names:
            if name in templates:
                state[name] = ck.restore(name, templates[name])
    return state
