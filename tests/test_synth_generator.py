"""Invariants of the synthetic-corpus generator (tools/make_synth_dataset).

The generator backs the scale benchmarks (synth10m-ind) and the parity
matrix (synth-ind); these tests pin the corpus properties the rest of the
stack relies on: the reference's dataset-layout contract (training corpus
carries old entities only; `_ind` corpus carries everyone — cf.
`/root/reference/src/perform_hashing.py:115-138` feature-consistency
check) and that the blocked inverse-CDF sampler actually draws from the
latent-affinity softmax (so models have signal to learn).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
from make_synth_dataset import generate  # noqa: E402


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synthgen"))
    generate(out, "g-ind", 300, 200, 20000, new_ratio=0.1)
    return out


def _read(path):
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        rows = [ln.rstrip("\n").split("\t") for ln in f if ln.strip()]
    return [h.split(":")[0] for h in header], rows


def test_training_corpus_features_old_entities_only(corpus):
    _, urows = _read(os.path.join(corpus, "g-ind", "g-ind.user"))
    _, irows = _read(os.path.join(corpus, "g-ind", "g-ind.item"))
    assert len(urows) == 270 and len(irows) == 180  # 90% old
    assert {r[0] for r in urows} == {f"u{k}" for k in range(270)}
    _, urows_ind = _read(os.path.join(corpus, "g-ind_ind", "g-ind_ind.user"))
    _, irows_ind = _read(os.path.join(corpus, "g-ind_ind", "g-ind_ind.item"))
    assert len(urows_ind) == 300 and len(irows_ind) == 200
    # shared rows bit-identical between the two corpora (the reference's
    # feature-consistency assertion holds by construction)
    assert urows_ind[:270] == urows and irows_ind[:180] == irows


def test_every_old_entity_covered_transductively(corpus):
    _, rows = _read(os.path.join(corpus, "g-ind", "g-ind.inter"))
    old = [(r[0], r[1]) for r in rows if r[3] == "-1"]
    assert {u for u, _ in old} == {f"u{k}" for k in range(270)}
    assert {i for _, i in old} == {f"i{k}" for k in range(180)}


def test_inductive_rows_touch_a_new_entity_and_reuse_seen_old_ones(corpus):
    _, rows = _read(os.path.join(corpus, "g-ind", "g-ind.inter"))
    old_u = {r[0] for r in rows if r[3] == "-1"}
    old_i = {r[1] for r in rows if r[3] == "-1"}
    new_rows = [r for r in rows if r[3] == "1"]
    assert new_rows
    for u, i, _, _ in new_rows:
        u_new = int(u[1:]) >= 270
        i_new = int(i[1:]) >= 180
        assert u_new or i_new
        if not u_new:
            assert u in old_u
        if not i_new:
            assert i in old_i
    # _ind test_filt is exactly the new-entity rows
    _, filt = _read(os.path.join(
        corpus, "g-ind_ind", "g-ind_ind.test_filt.inter"))
    assert [(r[0], r[1]) for r in filt] == [(r[0], r[1]) for r in new_rows]


def test_sampler_follows_latent_affinity(corpus):
    """Interactions must concentrate on high-affinity (u,i) pairs: the
    mean latent score of sampled pairs sits far above a random pairing
    (this is what makes the corpus learnable, and what the blocked
    inverse-CDF rewrite must preserve). Asserts against the factors the
    generator PERSISTED (g-ind.latent.npz) — replaying its internal RNG
    stream here would silently break on any draw-order change."""
    latent = np.load(os.path.join(corpus, "g-ind", "g-ind.latent.npz"))
    U, I = latent["U"], latent["I"]
    _, rows = _read(os.path.join(corpus, "g-ind", "g-ind.inter"))
    uu = np.array([int(r[0][1:]) for r in rows])
    ii = np.array([int(r[1][1:]) for r in rows])
    sampled = (U[uu] * I[ii]).sum(1).mean()
    rnd = np.random.default_rng(0)
    rand = (U[rnd.integers(0, 300, len(uu))]
            * I[rnd.integers(0, 200, len(ii))]).sum(1).mean()
    assert sampled > rand + 0.5, (sampled, rand)
