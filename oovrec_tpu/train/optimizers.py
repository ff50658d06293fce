"""Optimizer factory (`Trainer._build_optimizer`, `trainer.py:155-206`).

torch-semantics notes:
  * `weight_decay` in torch optimizers adds wd·param to the gradient BEFORE
    the adaptive transform — optax equivalent is `add_decayed_weights`
    chained BEFORE `scale_by_adam` (NOT adamw's decoupled decay).
"""

from __future__ import annotations

import optax


def build_optimizer(learner: str, learning_rate: float, weight_decay: float = 0.0):
    learner = (learner or "adam").lower()
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    if learner == "adam":
        txs.append(optax.scale_by_adam())
    elif learner == "sgd":
        pass
    elif learner == "adagrad":
        txs.append(optax.scale_by_rss())
    elif learner == "rmsprop":
        txs.append(optax.scale_by_rms())
    elif learner == "sparse_adam":
        txs.append(optax.scale_by_adam())
    else:
        # reference falls back to adam with a warning
        txs.append(optax.scale_by_adam())
    txs.append(optax.scale(-learning_rate))
    return optax.chain(*txs)


def clip_by_norm(clip_args):
    """`clip_grad_norm` config dict → optax transform."""
    if not clip_args:
        return None
    max_norm = clip_args.get("max_norm", clip_args.get("max", 1.0))
    return optax.clip_by_global_norm(float(max_norm))
