"""Exact param-subtree alignment inside optimizer-state pytrees.

Optax states (adam mu/nu, adagrad accumulators, sgd traces, ...) embed
subtrees that are literal `tree_map`s over the parameter tree, so their
treedef is *identical* to the parameter treedef. That identity is the
alignment key: walking the state and comparing each node's treedef against
the parameter treedef finds every param-structured subtree exactly — no
key-path suffix matching (which silently mis-associates when one param's
path is a suffix of another's, e.g. a top-level `embedding` next to
`user_embedding/embedding`).
"""

from __future__ import annotations

from typing import Any, Callable

import jax


def map_param_subtrees(
    params_like: Any,
    on_param_subtrees: Callable[..., Any],
    on_other_leaf: Callable[..., Any],
    *states: Any,
):
    """Walk `states` (same structure) in parallel; every node whose treedef
    equals `params_like`'s treedef is replaced by
    `on_param_subtrees(*nodes)`, remaining leaves by `on_other_leaf(*leaves)`.
    Containers (dicts, tuples, namedtuples, lists) are rebuilt as-is."""
    target = jax.tree_util.tree_structure(params_like)

    def walk(*nodes):
        first = nodes[0]
        if jax.tree_util.tree_structure(first) == target:
            return on_param_subtrees(*nodes)
        if isinstance(first, dict):
            return {k: walk(*(n[k] for n in nodes)) for k in first}
        if isinstance(first, (tuple, list)):
            children = [
                walk(*(n[i] for n in nodes)) for i in range(len(first))
            ]
            if hasattr(first, "_fields"):  # namedtuple (optax states)
                return type(first)(*children)
            return type(first)(children)
        if first is None:
            return None
        return on_other_leaf(*nodes)

    return walk(*states)
