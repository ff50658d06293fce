"""Checkpoint backends: pickle + orbax sharded round-trip on the mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oovrec_tpu.parallel.mesh import make_mesh, shard_params
from oovrec_tpu.train.checkpoint import load_checkpoint, save_checkpoint


def test_pickle_roundtrip(tmp_path):
    p = str(tmp_path / "ck.pkl")
    save_checkpoint(p, {"epoch": 3, "arr": np.arange(4)})
    s = load_checkpoint(p)
    assert s["epoch"] == 3
    np.testing.assert_array_equal(s["arr"], np.arange(4))


def test_orbax_sharded_roundtrip(tmp_path):
    mesh = make_mesh(4, 2)
    params = {
        "table": np.arange(8192 * 8, dtype=np.float32).reshape(8192, 8),
        "dense": np.ones((16, 8), np.float32),
    }
    placed = shard_params(mesh, params, row_shard_threshold=4096)
    assert not placed["table"].sharding.is_fully_replicated

    p = str(tmp_path / "ck.pkl")
    save_checkpoint(
        p, {"epoch": 1}, fmt="orbax", sharded_trees={"params": placed}
    )
    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        placed,
    )
    s = load_checkpoint(p, templates={"params": template})
    assert s["epoch"] == 1
    np.testing.assert_array_equal(
        np.asarray(s["params"]["table"]), params["table"]
    )
    # restored with the sharded layout
    assert not s["params"]["table"].sharding.is_fully_replicated
