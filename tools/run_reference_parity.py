"""Run the REFERENCE (torch CPU) paper pipeline on a local corpus.

The independent-training parity experiment: train the actual reference
implementation (`/root/reference/src/run_recbole.py:39` →
`perform_hashing.py:85`) on the same `synth-ind` corpus and protocol our
CLI uses, so the 7-slice inductive tables of the two *independently
trained* frameworks can be compared across seeds (VERDICT "What's
missing" #4).

The reference is imported read-only; its optional/unavailable deps
(wandb, google-cloud-storage, scann, csiphash, pyLSHash) are stubbed the
same way tests/test_reference_parity.py does. Nothing here feeds our
framework — this script only produces the reference side of the table.

Usage (from /root/repo):
  python tools/run_reference_parity.py --seed=2020 --embedder=lsh \
      --out=/tmp/ref_lsh_2020.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

REF_RECBOLE = "/root/reference/RecBole"
REF_SRC = "/root/reference/src"


def install_shims():
    import numpy as np

    for alias, typ in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)
    # numpy-2 removals that the reference's compatibility_settings
    # (`configurator.py:625-635`) still assigns from
    for alias, typ in (
        ("float_", np.float64), ("complex_", np.complex128),
        ("unicode_", np.str_), ("int_", np.int64), ("object_", object),
    ):
        if not hasattr(np, alias):
            setattr(np, alias, typ)

    # wandb: the driver calls wandb.log/alert guarded by log_wandb, but
    # imports it unconditionally
    wb = types.ModuleType("wandb")
    wb.run = None
    wb.log = lambda *a, **k: None
    wb.alert = lambda *a, **k: None
    wb.init = lambda *a, **k: None
    wb.finish = lambda *a, **k: None
    sys.modules.setdefault("wandb", wb)

    # google.cloud.storage: only touched when gcs_bucket_name is set
    gc = types.ModuleType("google.cloud")
    gcs = types.ModuleType("google.cloud.storage")

    class _NoClient:
        def __init__(self, *a, **k):
            raise RuntimeError("no GCS in this environment")

    gcs.Client = _NoClient
    gc.storage = gcs
    google = sys.modules.setdefault("google", types.ModuleType("google"))
    google.cloud = gc
    sys.modules.setdefault("google.cloud", gc)
    sys.modules.setdefault("google.cloud.storage", gcs)

    # native wheels the inductive package imports at module level
    pl = types.ModuleType("pyLSHash")
    st = types.ModuleType("pyLSHash.storage")

    class _Store:
        def __init__(self, *a, **k):
            pass

    st.StorageBase = st.InMemoryStorage = st.RedisStorage = _Store
    pl.storage = st
    sys.modules.setdefault("pyLSHash", pl)
    sys.modules.setdefault("pyLSHash.storage", st)
    # scann: the wheel is absent here; stand in with an EXACT brute-force
    # dot-product searcher exposing the one call the reference makes
    # (`knn_embedder.py:84-101`: builder(db, k, "dot_product").tree(...)
    # .score_ah(...).reorder(...).build() → search_batched(q,
    # final_num_neighbors=k)). Exact search ⊇ ScaNN's ANN result set, and
    # our framework's knn embedder is exact by design — so the parity row
    # compares equal semantics (documented in PARITY.md).
    scann_mod = types.ModuleType("scann")
    ops = types.ModuleType("scann.scann_ops_pybind")

    class _ExactSearcher:
        def __init__(self, db):
            self._db = np.asarray(db, dtype=np.float32)

        def search_batched(self, queries, final_num_neighbors=10, **k):
            q = np.asarray(queries, dtype=np.float32)
            scores = q @ self._db.T
            kk = min(final_num_neighbors, scores.shape[1])
            idx = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            order = np.argsort(
                -np.take_along_axis(scores, idx, axis=1), axis=1
            )
            idx = np.take_along_axis(idx, order, axis=1)
            return idx, np.take_along_axis(scores, idx, axis=1)

    class _Builder:
        def __init__(self, db, *a, **k):
            self._db = db

        def tree(self, *a, **k):
            return self

        def score_ah(self, *a, **k):
            return self

        def reorder(self, *a, **k):
            return self

        def build(self):
            return _ExactSearcher(self._db)

    ops.builder = _Builder
    scann_mod.scann_ops_pybind = ops
    sys.modules.setdefault("scann", scann_mod)
    sys.modules.setdefault("scann.scann_ops_pybind", ops)

    csip = types.ModuleType("csiphash")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from oovrec_tpu.ops.siphash import siphash24_py

    csip.siphash24 = siphash24_py
    sys.modules.setdefault("csiphash", csip)

    # pure-cosmetics deps absent from this image
    import logging

    cl = types.ModuleType("colorlog")

    class _ColoredFormatter(logging.Formatter):
        def __init__(self, fmt=None, datefmt=None, log_colors=None, **k):
            super().__init__(fmt.replace("%(log_color)s", "") if fmt else fmt,
                             datefmt)

    cl.ColoredFormatter = _ColoredFormatter
    sys.modules.setdefault("colorlog", cl)

    tt = types.ModuleType("texttable")

    class _Texttable:
        def __getattr__(self, name):
            if name == "draw":
                return lambda: "(texttable unavailable)"
            return lambda *a, **k: self

    tt.Texttable = _Texttable
    sys.modules.setdefault("texttable", tt)

    ray = types.ModuleType("ray")
    ray.tune = types.ModuleType("ray.tune")
    sys.modules.setdefault("ray", ray)
    sys.modules.setdefault("ray.tune", ray.tune)

    for p in (REF_RECBOLE, REF_SRC):
        if p not in sys.path:
            sys.path.insert(0, p)

    # the reference predates torch's weights_only=True default; its
    # checkpoints embed the pickled Config. The files are produced by this
    # very process seconds earlier — trusted.
    import torch

    _orig_load = torch.load

    def _load(*a, **k):
        k.setdefault("weights_only", False)
        return _orig_load(*a, **k)

    torch.load = _load


def paper_args(ns) -> dict:
    """The reference __main__'s protocol overrides
    (`src/run_recbole.py:202-227`), minus CLI parsing."""
    args = {
        "model": ns.model,
        "dataset": ns.dataset,
        "seed": ns.seed,
        "epochs": ns.epochs,
        # embedding_size: only when explicitly requested — the paper
        # driver does NOT set it, so the model yaml's default rules
        # (WideDeep/xDeepFM d=10). Round-4's default of 64 silently gave
        # the reference side 6.4x the field capacity in every RANKING
        # cell (our side used the yaml default) — the "seed instability"
        # divergence was this harness mismatch (PARITY.md round 5).
        "train_batch_size": ns.train_batch_size,
        "inductive_eval": True,
        "add_oov_buckets": ns.add_oov_buckets,
        "train_oov": ns.train_oov,
        "oov_train_ratio": ns.oov_train_ratio,
        # reference key names (`get_inductive.py:30-31`); our CLI calls
        # these n_user_oov_buckets / n_item_oov_buckets
        "user_oov_buckets": ns.n_buckets,
        "item_oov_buckets": ns.n_buckets,
        # The synth corpus keeps new entities' features only in the `_ind`
        # dir (the real paper datasets' convention — their transductive
        # corpus carries no loadable is_new column, else
        # `_remove_new_samples` `dataset.py:179` would KeyError since no
        # '1' token survives the feature filter). The reference force-adds
        # is_new to any explicit load_col (`dataset.py:443`), so the only
        # way to keep it out is load_col=None + unload_col. The inductive
        # rows then drop via `_filter_inter_by_user_or_item`
        # (`dataset.py:1112`, default True): every is_new=1 row references
        # an entity with no transductive feature row — exactly the
        # is_new-removal semantics our CLI applies.
        "load_col": None,
        "unload_col": {"inter": ["is_new"]},
        "log_wandb": False,
        "use_gpu": False,
        "worker": 0,
        "stopping_step": ns.stopping_step,
    }
    if ns.embedding_size is not None:
        args["embedding_size"] = ns.embedding_size
    if ns.mapper:
        args["inductive_mapper"] = ns.mapper
    if ns.embedder:
        args["inductive_embedder"] = ns.embedder
    if ns.dhe_num_hashes:
        args["dhe_num_hashes"] = ns.dhe_num_hashes
    if ns.model == "DirectAU":
        # the reference ships no DirectAU.yaml — gamma comes from the
        # paper's dataset JSONs; 1.0 is the paper default (our model's
        # dataclass default matches)
        args["gamma"] = 1.0
    if ns.model_eval_type == "retrieval":
        args["valid_metric"] = "MRR@20"
        args["metrics"] = ["Recall", "MRR", "NDCG", "Hit", "Precision"]
    else:
        args["valid_metric"] = "RMSE"
        args["metrics"] = ["AUC", "RMSE"]
        args["model_eval_type"] = "ranking"
        # synth corpora have no rating column; labels come from the
        # 1-neg pointwise expansion (the round-1 ranking protocol)
        args["threshold"] = None
    args["eval_args"] = {
        "split": {"RS": [0.88, 0.02, 0.1]},
        "group_by": None,
        "order": "TO",
        "mode": "uni250",
    }
    args["eval_batch_size"] = int(1e5)
    args["topk"] = [10, 20]
    for key in ("train_neg_sample_args", "oov_neg_sample_args",
                "test_neg_sample_args"):
        args[key] = {
            "distribution": "uniform", "sample_num": 1, "alpha": 1.0,
            "dynamic": False, "candidate_num": 0,
        }
    if ns.model_eval_type == "retrieval":
        args["threshold"] = None
    args["fixed_dataset_issue"] = True
    args["reproducibility"] = True
    return args


def link_ind_files(dataset: str, data_root: str = "dataset"):
    """The reference resolves the `_ind` corpus inside the TRANSDUCTIVE
    dataset dir (`perform_hashing.py` keeps the checkpoint's data_path;
    only the dataset name gains `_ind`), while our layout keeps a sibling
    `<ds>_ind/` dir. Symlink the `_ind` files in (idempotent)."""
    src_dir = os.path.join(data_root, dataset + "_ind")
    dst_dir = os.path.join(data_root, dataset)
    for fn in os.listdir(src_dir):
        dst = os.path.join(dst_dir, fn)
        if not os.path.exists(dst):
            os.symlink(os.path.relpath(os.path.join(src_dir, fn), dst_dir),
                       dst)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="BPR")
    ap.add_argument("--dataset", default="synth-ind")
    ap.add_argument("--seed", type=int, default=2020)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--embedding_size", type=int, default=None)
    ap.add_argument("--train_batch_size", type=int, default=2048)
    ap.add_argument("--mapper", default="random")
    ap.add_argument("--embedder", default=None)
    ap.add_argument("--add_oov_buckets", action="store_true", default=False)
    ap.add_argument("--train_oov", action="store_true", default=False)
    ap.add_argument("--oov_train_ratio", type=float, default=0.3)
    ap.add_argument("--n_buckets", type=int, default=200)
    ap.add_argument("--stopping_step", type=int, default=10)
    ap.add_argument("--model_eval_type", default="retrieval")
    ap.add_argument("--dhe_num_hashes", type=int, default=None)
    ap.add_argument("--out", default=None)
    ns = ap.parse_args()

    install_shims()
    link_ind_files(ns.dataset)

    from run_recbole import run_recbole  # /root/reference/src
    from perform_hashing import perform_inductive_eval

    # thop (FLOPs counter wheel) is absent; the count is cosmetic
    sys.modules["run_recbole"].get_flops = lambda *a, **k: 0

    results, config = run_recbole(
        model=ns.model, dataset=ns.dataset, config_dict=paper_args(ns)
    )
    ind = perform_inductive_eval(
        orig_dataset=results["dataset"],
        checkpoint_path=results["checkpoint_path"],
        mapper_path=results["mapper_path"],
        embedder_path=results["embedder_path"],
        oov_eval_batch_size=config["oov_eval_batch_size"],
    )
    payload = {
        "framework": "reference-torch-cpu",
        "model": ns.model,
        "seed": ns.seed,
        "embedder": ns.embedder,
        "mapper": ns.mapper,
        "test_result": {k: float(v) for k, v in results["test_result"].items()},
        "inductive": {
            s: {k: float(v) for k, v in r.items()} for s, r in ind.items()
        },
    }
    text = json.dumps(payload, indent=1)
    if ns.out:
        with open(ns.out, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
