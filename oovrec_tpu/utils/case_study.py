"""Per-user score inspection helpers (`recbole/utils/case_study.py` analog)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def full_sort_scores(uid_list, model, variables, estate=None,
                     hist_per_user=None):
    """Raw full-corpus scores for the given internal user ids, with the
    users' history (if given) masked to -inf like the eval path."""
    batch = {model.uid_field: jnp.asarray(np.asarray(uid_list, np.int32))}
    scores = model.apply(
        variables, batch, estate or {}, method=model.full_sort_scores
    )
    scores = np.asarray(scores)
    scores[:, 0] = -np.inf
    if hist_per_user is not None:
        for i, u in enumerate(uid_list):
            hist = hist_per_user[int(u)]
            if len(hist):
                scores[i, np.asarray(hist)] = -np.inf
    return scores


def full_sort_topk(uid_list, model, variables, k, estate=None,
                   hist_per_user=None):
    scores = full_sort_scores(
        uid_list, model, variables, estate, hist_per_user
    )
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx
