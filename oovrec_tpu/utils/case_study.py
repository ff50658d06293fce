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
    scores = np.array(scores)  # mutable copy: np.asarray of a jax array is read-only
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


def case_study_from_checkpoint(user_tokens, model_file: str, k: int = 10):
    """External-token case study straight from a checkpoint file: restore
    via `quick_start.load_data_and_model`, map tokens → internal ids,
    mask each user's training history, return (scores, item_tokens) of
    the top-k — the reference's documented case-study recipe
    (`recbole/utils/case_study.py:17-35` + `quick_start.py:168`)."""
    from oovrec_tpu.cli.quick_start import load_data_and_model

    loaded = load_data_and_model(model_file)
    ds = loaded.dataset
    uids = np.asarray(
        [ds.token2id(ds.uid_field, str(t)) for t in user_tokens], np.int32
    )
    train_split = loaded.train_loader.split
    uidx = np.asarray(train_split.inter[ds.uid_field])
    iidx = np.asarray(train_split.inter[ds.iid_field])
    hist = {int(u): iidx[uidx == u] for u in uids}
    scores, topk = full_sort_topk(
        uids, loaded.model, loaded.variables, k,
        estate=loaded.estate, hist_per_user=hist,
    )
    tokens = np.asarray(ds.id2token(ds.iid_field, topk.reshape(-1))).reshape(
        topk.shape
    )
    return scores, tokens
