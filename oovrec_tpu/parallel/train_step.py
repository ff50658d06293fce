"""Sharded training step builder.

Builds a jit-compiled train step whose inputs/outputs carry explicit
NamedShardings over a ('data','model') mesh: batch split over 'data',
large embedding tables row-sharded over 'model', everything else
replicated. XLA/GSPMD inserts the collectives (ICI all-gather for routed
table rows, psum/reduce-scatter for gradients) — the TPU-native equivalent
of the reference's DDP backward-hook all-reduce (`trainer.py:68-101`).
"""

from __future__ import annotations


import jax
import optax

from oovrec_tpu.parallel.mesh import (
    batch_sharding,
    param_sharding,
    replicated,
)


def make_sharded_train_step(
    model, tx, mesh, params_template, batch_template, estate_template=None,
    row_shard_threshold: int = 4096,
):
    """Returns (step_fn, placed_shardings) where
    step_fn(params, opt_state, batch, estate) → (loss, params, opt_state).
    """
    p_shard = param_sharding(mesh, params_template, row_shard_threshold)
    b_shard = batch_sharding(mesh, batch_template)
    opt_state_shapes = jax.eval_shape(tx.init, params_template)
    o_shard = opt_state_sharding(mesh, opt_state_shapes, p_shard)
    e_shard = replicated(mesh, estate_template or {})
    loss_shard = replicated(mesh, 0.0)

    def step(params, opt_state, batch, estate):
        def loss_fn(p):
            return model.apply(
                {"params": p}, batch, estate, method=model.calculate_loss
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return loss, new_params, new_opt_state

    step_jit = jax.jit(
        step,
        in_shardings=(p_shard, o_shard, b_shard, e_shard),
        out_shardings=(loss_shard, p_shard, o_shard),
        donate_argnums=(0, 1),
    )
    return step_jit, {
        "params": p_shard,
        "opt_state": o_shard,
        "batch": b_shard,
        "estate": e_shard,
    }


def opt_state_sharding(mesh, opt_state_shapes, p_shard):
    """Optimizer-state shardings mirror the param shardings.

    Adam mu/nu (and friends) are param-structured subtrees — their
    treedef is identical to the parameter treedef, which is the exact
    alignment key (utils/tree_align.py); such subtrees inherit the param
    shardings wholesale, structural leaves (step counts) are replicated.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from oovrec_tpu.utils.tree_align import map_param_subtrees

    return map_param_subtrees(
        p_shard,
        lambda _sub: p_shard,
        lambda _leaf: NamedSharding(mesh, P()),
        opt_state_shapes,
    )
