"""Generate a synthetic inductive dataset family at configurable scale.

Produces `<name>/` (training corpus with is_new rows + feature files) and
`<name>_ind/` (benchmark train/empty/test_filt + full feature files) in
the atomic-file format, with latent-factor structure so models actually
learn (users/items get latent vectors; interactions sample ∝ affinity).

Usage:
  python tools/make_synth_dataset.py --out=dataset --name=synth-ind \
      --users=2000 --items=1000 --inters=60000 --new_ratio=0.1
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from oovrec_tpu.config.configurator import parse_cli_args  # noqa: E402


def generate(out: str, name: str, n_users: int, n_items: int, n_inters: int,
             new_ratio: float = 0.1, dim: int = 8, seed: int = 7,
             feat_dims: int = 4, feat_noise: float = 0.3):
    rng = np.random.default_rng(seed)
    n_new_u = int(n_users * new_ratio)
    n_new_i = int(n_items * new_ratio)
    n_old_u, n_old_i = n_users - n_new_u, n_items - n_new_i

    U = rng.standard_normal((n_users, dim)) * 0.7
    I = rng.standard_normal((n_items, dim)) * 0.7
    # observable features correlate with the latent factors
    u_age = (U[:, 0] * 10 + 35 + rng.standard_normal(n_users)).round(1)
    u_group = (U[:, 1] > 0).astype(int)
    i_price = (I[:, 0] * 20 + 50 + rng.standard_normal(n_items)).round(2)
    i_cat = np.argmax(I[:, 1:4], axis=1)

    def sample_inters(users, items_pool, n, t0):
        # exact softmax sampling, grouped by user: one CDF per distinct
        # user row (inverse-CDF draw), blocked so the (block × items)
        # logit slab stays memory-bounded at any n
        uu = rng.integers(0, len(users), n)
        ii = np.empty(n, np.int64)
        order = np.argsort(uu, kind="stable")
        uu_sorted = uu[order]
        uniq, starts = np.unique(uu_sorted, return_index=True)
        ends = np.append(starts[1:], n)
        Ip = I[items_pool].astype(np.float32).T
        block = max(1, (1 << 26) // max(1, len(items_pool)))
        for bs in range(0, len(uniq), block):
            ub = uniq[bs:bs + len(uniq[bs:bs + block])]
            logits = U[users[ub]].astype(np.float32) @ Ip
            logits -= logits.max(axis=1, keepdims=True)
            cdf = np.cumsum(np.exp(logits), axis=1)
            for k in range(len(ub)):
                s, e = starts[bs + k], ends[bs + k]
                r = rng.random(e - s).astype(np.float32) * cdf[k, -1]
                ii[order[s:e]] = np.searchsorted(cdf[k], r, side="right")
        np.clip(ii, 0, len(items_pool) - 1, out=ii)
        return users[uu], items_pool[ii], t0 + np.arange(n)

    old_users = np.arange(n_old_u)
    old_items = np.arange(n_old_i)
    all_users = np.arange(n_users)
    all_items = np.arange(n_items)

    n_old_inters = int(n_inters * (1 - new_ratio))
    tu, ti, tt = sample_inters(old_users, old_items, n_old_inters, 0)
    # coverage: every old entity needs ≥1 transductive interaction so both
    # corpora assign identical ids (reference datasets are k-core filtered,
    # which guarantees this)
    missing_u = np.setdiff1d(old_users, np.unique(tu))
    missing_i = np.setdiff1d(old_items, np.unique(ti))
    n_fix = max(len(missing_u), len(missing_i))
    if n_fix:
        fu = np.concatenate([missing_u, rng.choice(old_users, n_fix - len(missing_u))])
        fi = np.concatenate([missing_i, rng.choice(old_items, n_fix - len(missing_i))])
        ft = ((tt[-1] + 1) if len(tt) else 0) + np.arange(n_fix)
        tu, ti, tt = (
            np.concatenate([tu, fu]),
            np.concatenate([ti, fi]),
            np.concatenate([tt, ft]),
        )
    # inductive-only rows: any user × any item but touching a new entity
    n_new_rows = n_inters - n_old_inters
    nu, ni, nt = sample_inters(all_users, all_items, n_new_rows, n_old_inters)
    touch_new = (nu >= n_old_u) | (ni >= n_old_i)
    nu, ni, nt = nu[touch_new], ni[touch_new], nt[touch_new]
    # old entities referenced by the inductive split must also appear in
    # the transductive split, otherwise the two corpora would assign them
    # different ids (the reference's feature-consistency check enforces
    # this property on its datasets)
    seen_u = np.zeros(n_users, bool)
    seen_u[np.unique(tu)] = True
    seen_i = np.zeros(n_items, bool)
    seen_i[np.unique(ti)] = True
    ok = ((nu >= n_old_u) | seen_u[nu]) & ((ni >= n_old_i) | seen_i[ni])
    nu, ni, nt = nu[ok], ni[ok], nt[ok]

    def w(path, lines):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

    # vector features (the reference datasets carry *_vector float_seq
    # columns; multi-dim blocks are what make per-feature L2 normalization
    # discriminative for the LSH/kNN/DNN embedders)
    u_vec = (U[:, :feat_dims]
             + feat_noise * rng.standard_normal((n_users, feat_dims))).round(4)
    i_vec = (I[:, :feat_dims]
             + feat_noise * rng.standard_normal((n_items, feat_dims))).round(4)

    def user_rows(ids):
        return [
            f"u{u}\t{u_age[u]}\tg{u_group[u]}\t"
            + " ".join(map(str, u_vec[u]))
            for u in ids
        ]

    def item_rows(ids):
        return [
            f"i{i}\t{i_price[i]}\tc{i_cat[i]}\t"
            + " ".join(map(str, i_vec[i]))
            for i in ids
        ]

    uh = "user_id:token\tage:float\tgroup:token\tuser_vector:float_seq"
    ih = "item_id:token\tprice:float\tcategory:token\titem_vector:float_seq"

    # training corpus (old rows marked -1, new rows 1). Its feature files
    # contain OLD entities only — new entities exist solely in the _ind
    # corpus, which is what makes them out-of-vocabulary (the reference's
    # dataset layout; n_old = the training dataset's entity counts).
    d = os.path.join(out, name)
    inter = ["user_id:token\titem_id:token\ttimestamp:float\tis_new:token"]
    inter += [f"u{u}\ti{i}\t{t}\t-1" for u, i, t in zip(tu, ti, tt)]
    inter += [f"u{u}\ti{i}\t{t}\t1" for u, i, t in zip(nu, ni, nt)]
    w(f"{d}/{name}.inter", inter)
    w(f"{d}/{name}.user", [uh] + user_rows(old_users))
    w(f"{d}/{name}.item", [ih] + item_rows(old_items))

    # inductive corpus: train = old rows; test_filt = the new-entity rows
    d2 = os.path.join(out, f"{name}_ind")
    w(f"{d2}/{name}_ind.train.inter",
      ["user_id:token\titem_id:token\ttimestamp:float"]
      + [f"u{u}\ti{i}\t{t}" for u, i, t in zip(tu, ti, tt)])
    w(f"{d2}/{name}_ind.empty.inter",
      ["user_id:token\titem_id:token\ttimestamp:float"])
    w(f"{d2}/{name}_ind.test_filt.inter",
      ["user_id:token\titem_id:token\ttimestamp:float"]
      + [f"u{u}\ti{i}\t{t}" for u, i, t in zip(nu, ni, nt)])
    w(f"{d2}/{name}_ind.user", [uh] + user_rows(all_users))
    w(f"{d2}/{name}_ind.item", [ih] + item_rows(all_items))
    # persist the latent factors: tests assert affinity properties against
    # THESE arrays instead of replaying the generator's internal RNG
    # stream (which silently breaks on any draw-order change)
    np.savez(f"{d}/{name}.latent.npz", U=U, I=I)
    print(f"wrote {name}: {len(tu)} transductive + {len(nu)} inductive rows")


if __name__ == "__main__":
    a = parse_cli_args(sys.argv[1:])
    generate(
        a.get("out", "dataset"), a.get("name", "synth-ind"),
        int(a.get("users", 2000)), int(a.get("items", 1000)),
        int(a.get("inters", 60000)), float(a.get("new_ratio", 0.1)),
        feat_dims=int(a.get("feat_dims", 4)),
        feat_noise=float(a.get("feat_noise", 0.3)),
    )
