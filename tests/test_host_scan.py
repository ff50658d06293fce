"""Host-scan dispatch (`host_scan_steps`): K host batches per device call.

The scanned program runs the SAME per-step computation (loss, rng stream
`fold_in(dropout_key, global_step)`, optimizer, freeze masks) as the
per-batch path, so the training trajectory must match to float tolerance;
remainder batches (< K) go through the per-batch step itself."""

import numpy as np
import pytest

from oovrec_tpu.config import Config
from oovrec_tpu.data.utils import create_dataset, data_preparation
from oovrec_tpu.cli.quick_start import build_model_and_state
from oovrec_tpu.train.trainer import Trainer

from tests.test_more_models import _cfg as gen_cfg


def _train(host_scan_steps, epochs=2, **over):
    cfg_dict = gen_cfg("BPR", epochs=epochs)
    cfg_dict["host_scan_steps"] = host_scan_steps
    cfg_dict["train_batch_size"] = 8  # many small batches → several groups
    cfg_dict.update(over)
    config = Config(config_dict=cfg_dict)
    ds = create_dataset(config)
    train_loader, valid_loader, test_loader = data_preparation(config, ds)
    template = train_loader._make_batch(np.arange(2))
    model, variables, estate = build_model_and_state(
        config, ds, template_batch=template
    )
    trainer = Trainer(config, model, variables, estate)
    losses = [
        trainer._train_epoch(train_loader, e) for e in range(epochs)
    ]
    return losses, trainer


def test_scan_matches_per_batch_trajectory():
    l1, t1 = _train(host_scan_steps=1)
    l4, t4 = _train(host_scan_steps=4)
    # same epoch losses (scan reorders only the dispatch, not the math)
    np.testing.assert_allclose(l1, l4, rtol=2e-5)
    # same final params
    import jax

    p1 = jax.tree_util.tree_leaves(t1.variables["params"])
    p4 = jax.tree_util.tree_leaves(t4.variables["params"])
    for a, b in zip(p1, p4):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-6
        )


def test_scan_k_larger_than_loader_uses_per_batch():
    # K > n_batches → everything lands in the remainder (per-batch) path
    l1, _ = _train(host_scan_steps=1, epochs=1)
    lbig, _ = _train(host_scan_steps=1000, epochs=1)
    np.testing.assert_allclose(l1, lbig, rtol=1e-6)


def test_auto_disengages_for_tiny_loaders():
    cfg = gen_cfg("BPR")
    cfg["train_batch_size"] = 8
    config = Config(config_dict=cfg)
    ds = create_dataset(config)
    train_loader, _, _ = data_preparation(config, ds)
    template = train_loader._make_batch(np.arange(2))
    model, variables, estate = build_model_and_state(
        config, ds, template_batch=template
    )
    trainer = Trainer(config, model, variables, estate)
    assert trainer._host_scan_k(train_loader) == 1  # len < 4*16


def test_dynamic_negatives_stay_per_batch():
    cfg = gen_cfg("BPR")
    config = Config(config_dict=cfg)
    ds = create_dataset(config)
    train_loader, _, _ = data_preparation(config, ds)
    train_loader.dynamic = True
    template = train_loader._make_batch(np.arange(2))
    model, variables, estate = build_model_and_state(
        config, ds, template_batch=template
    )
    trainer = Trainer(config, model, variables, estate)
    trainer.config["host_scan_steps"] = 8
    assert trainer._host_scan_k(train_loader) == 1
