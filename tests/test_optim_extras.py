"""Lazy (sparse) adam, dynamic negative sampling, distributed helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from oovrec_tpu.cli.quick_start import objective_function
from oovrec_tpu.parallel.distributed import (
    initialize_distributed,
    map_reduce_metrics,
)
from oovrec_tpu.train.optimizers import build_optimizer, scale_by_lazy_adam

from tests.test_more_models import _cfg


def test_lazy_adam_freezes_untouched_rows():
    tx = optax.chain(scale_by_lazy_adam(), optax.scale(-0.1))
    p = {"emb": jnp.ones((6, 3)), "b": jnp.ones((3,))}
    g = {"emb": jnp.zeros((6, 3)).at[2].set(1.0), "b": jnp.ones((3,))}
    st = tx.init(p)
    u, st = tx.update(g, st, p)
    p2 = optax.apply_updates(p, u)
    np.testing.assert_allclose(np.asarray(p2["emb"])[0], 1.0)
    assert not np.allclose(np.asarray(p2["emb"])[2], 1.0)
    # zero step afterwards: frozen rows stay exactly (dense adam would drift)
    u, st = tx.update(
        {"emb": jnp.zeros((6, 3)), "b": jnp.zeros((3,))}, st, p2
    )
    p3 = optax.apply_updates(p2, u)
    np.testing.assert_array_equal(np.asarray(p3["emb"]), np.asarray(p2["emb"]))


def test_lazy_adam_matches_adam_when_all_touched():
    dense = optax.chain(optax.scale_by_adam(), optax.scale(-0.01))
    lazy = optax.chain(scale_by_lazy_adam(), optax.scale(-0.01))
    p = jnp.ones((4, 3))
    g = jnp.full((4, 3), 0.5)
    sd, sl = dense.init(p), lazy.init(p)
    for _ in range(3):
        ud, sd = dense.update(g, sd, p)
        ul, sl = lazy.update(g, sl, p)
        # optax factors its bias corrections slightly differently; the
        # match is to ~1e-4 relative, which is all the semantics require
        np.testing.assert_allclose(np.asarray(ud), np.asarray(ul), atol=1e-4)


def test_sparse_adam_end_to_end():
    res = objective_function(
        config_dict=_cfg("BPR", learner="sparse_adam"), saved=False
    )
    assert "recall@5" in res["test_result"]


def test_dynamic_negative_sampling_end_to_end():
    res = objective_function(
        config_dict=_cfg(
            "BPR",
            train_neg_sample_args={
                "distribution": "uniform", "sample_num": 1,
                "dynamic": True, "candidate_num": 4,
            },
        ),
        saved=False,
    )
    assert "recall@5" in res["test_result"]


def test_distributed_single_host():
    info = initialize_distributed()
    assert info["process_count"] == 1
    r = map_reduce_metrics({"recall@10": 0.5}, 100)
    assert r["recall@10"] == 0.5


def test_torch_adam_semantics_bit_parity():
    """`scale_by_torch_adam` (round-3 lsh-gap ablation) reproduces torch
    plain Adam exactly, INCLUDING skipped steps (torch: grad None →
    param skipped, per-param step count frozen)."""
    import numpy as np
    import optax
    import torch

    import jax.numpy as jnp
    from oovrec_tpu.train.optimizers import scale_by_torch_adam

    tp = torch.nn.Parameter(torch.ones(4, 2))
    opt = torch.optim.Adam([tp], lr=0.1)
    tx = optax.chain(scale_by_torch_adam(), optax.scale(-0.1))
    jp = {"a": jnp.ones((4, 2))}
    st = tx.init(jp)
    rng = np.random.default_rng(0)
    for i in range(8):
        skip = i in (2, 4, 5)
        g = np.zeros((4, 2)) if skip else rng.normal(size=(4, 2))
        opt.zero_grad(set_to_none=True)
        if not skip:
            tp.grad = torch.tensor(g, dtype=torch.float32)
            opt.step()
        u, st = tx.update({"a": jnp.asarray(g, jnp.float32)}, st, jp)
        jp = optax.apply_updates(jp, u)
    diff = np.abs(np.asarray(jp["a"]) - tp.detach().numpy()).max()
    assert diff < 1e-5, diff


def test_run_hyper_ray_tool_fast_fails_without_wheel(tmp_path):
    """`--tool=ray` (the reference's ray.tune delegation,
    `ref:RecBole/run_hyper.py:45-107`): in this zero-egress image the ray
    wheel is absent — the CLI must fail fast with an actionable message,
    never hang or crash obscurely."""
    import pytest

    from oovrec_tpu.cli.run_hyper import main

    pf = tmp_path / "p.hyper"
    pf.write_text("learning_rate choice [0.01,0.001]\n")
    with pytest.raises(SystemExit, match="ray"):
        main([
            "--model=BPR", "--dataset=toy", "--data_path=tests/assets",
            f"--params_file={pf}", "--tool=ray", "--epochs=1",
        ])
