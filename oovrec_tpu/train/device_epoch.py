"""Device-resident training epochs — the host removed from the loop.

The host pipeline (per-batch index slice → numpy negative resampling →
tile/pad/joins → H2D transfer) caps end-to-end throughput at a few
hundred k examples/s while the jitted step alone sustains tens of M/s —
the reference has the same shape of problem (per-batch pandas/python,
`abstract_dataloader.py` + `sampler.py:147`), it just hides behind a GPU
that is only ~10× faster than its host path.

Here the epoch's split columns live in HBM and each epoch is ONE compiled
XLA program (`lax.scan` over steps, params/opt-state donated). Three
loader modes are covered, spanning every paper track:

  * pairwise (retrieval, BPR-family): on-device uniform negative sampling
    with used-pair avoidance against a packed (n_users, n_items/32)
    bitmap — the host sampler's bounded-resampling semantics
    (`data/sampler.py:106-126`), budget spent lazily in a while_loop;
    OOV-simulation sub-epochs run on device too (flags, id masking,
    bucket hashes via ops/inthash_device, Bernoulli step keep, optional
    frozen-IV updates).
  * pointwise (CTR/ranking): inter columns tiled ×2, [positives ∥ negs]
    item column, generated 1/0 labels, and user/item FEATURE COLUMNS
    JOINED ON DEVICE from HBM-resident tables
    (`_join_features` semantics, dataloader.py:57-67).
  * plain (sequential CE and other no-negative losses): the raw split
    columns (sequence lists included) feed the loss directly.

The RNG streams necessarily differ from the host pipeline's numpy
streams. Eligibility: `device_epoch_eligible` — static uniform 1-neg (or
none), Equal transform, no DHE host hashing, single process (an active
single-process mesh is fine: the epoch program compiles SPMD), and the
model's `supports_device_epoch` flag asserting its loss consumes only
split columns (+ joined features / sampled negatives). Gated by
`device_epoch: auto|true|false` — `auto` enables at ≥100k interactions so
tiny fixture runs keep the host path's seeded trajectories.
"""

from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.data.sampler import _MAX_RESAMPLE_ROUNDS

AUTO_MIN_ROWS = 100_000


def build_used_bitmap(per_user_used, n_users: int, n_items: int) -> np.ndarray:
    """Pack the sampler's per-user used-item id lists into a
    (n_users, ceil(n_items/32)) int32 bitmap (bit j of word w set ⇔ item
    w*32+j is used by that user). Item 0 (PAD) is always marked used."""
    W = -(-n_items // 32)
    bm = np.zeros((n_users, W), np.uint32)
    for u, items in enumerate(per_user_used):
        if u >= n_users or len(items) == 0:
            continue
        it = np.asarray(items, np.int64)
        np.bitwise_or.at(
            bm[u], it >> 5, np.uint32(1) << (it & 31).astype(np.uint32)
        )
    bm[:, 0] |= np.uint32(1)  # PAD column
    return bm.view(np.int32)


class DeviceEpoch:
    """One-compile-per-shape whole-epoch runner bound to a Trainer.

    Under an active ('data','model') mesh the epoch arrays commit
    'data'-sharded (the bitmap replicated); the scan body then compiles
    SPMD against the trainer's mesh-committed params — the whole-epoch
    program IS the multi-chip program, no per-batch host sharding."""

    def __init__(self, trainer, loader, oov: bool = False,
                 frozen: bool = False):
        split = loader.split
        self.oov = oov
        self.frozen = frozen
        self.mode = loader.mode  # "pairwise" | "pointwise" | "plain"
        self.uid_field = loader.uid_field
        self.iid_field = loader.iid_field
        self.neg_field = loader.neg_prefix + loader.iid_field
        self.n_real = len(split)
        # GLOBAL positives per step: every process holds the full split
        # and executes the same whole-epoch SPMD program — the loader's
        # per-process interleaving (host pipeline) does not apply here
        B = loader.step
        n_steps = max(-(-self.n_real // B), 1)
        n_pad = n_steps * B

        if trainer.mesh is not None:
            from oovrec_tpu.parallel.mesh import put_replicated

            place = lambda v: put_replicated(trainer.mesh, v)  # noqa: E731
        else:
            place = jnp.asarray

        w = np.zeros(n_pad, np.float32)
        w[: self.n_real] = 1.0
        self.weights = place(w)
        self.n_items = split.item_num
        # sampling metadata (pairwise only); repeatable samplers
        # (sequential protocols, `RepeatableSampler` semantics) draw
        # plain uniforms — no used-pair bitmap
        self.repeatable = bool(getattr(loader.sampler, "repeatable", False))
        self.bitmap = None
        if self.mode in ("pairwise", "pointwise") and not self.repeatable:
            self.bitmap = place(
                build_used_bitmap(
                    loader.sampler.used_ids[loader.phase],
                    split.user_num, split.item_num,
                )
            )
        # popularity sampling (`sampler.py:78-93`): the host draws from
        # counts**alpha normalized — on device the same distribution is an
        # O(1) Walker alias-table draw (data/alias.py): two gathers + one
        # compare per draw, static shapes. (Round 4's inverse-CDF
        # searchsorted cost 4.1× the uniform epoch at 10M — the
        # log(n_items) gather chain ran inside the resampling while_loop.)
        self.pop_tab = None
        pop_p = getattr(loader.sampler, "_pop_p", None)
        if (self.mode in ("pairwise", "pointwise")
                and pop_p is not None):
            from oovrec_tpu.data.alias import build_alias_table

            prob, alias = build_alias_table(pop_p)
            self.pop_tab = (place(prob), place(alias))
        # pointwise expansion factor: 1 positive + (times-1) negatives
        # (`dataloader.py` neg_flat order='F' layout)
        self.times = int(getattr(loader, "times", 2) or 2)

        def pad_col(v):
            v = np.asarray(v)
            if v.dtype == np.int64:
                v = v.astype(np.int32)
            elif v.dtype == np.float64:
                v = v.astype(np.float32)
            tail = np.zeros((n_pad - self.n_real,) + v.shape[1:], v.dtype)
            return place(np.concatenate([v, tail]))

        # carry every split column (models read what they need — sequence
        # lists for the seq family, ids for two-tower; extras are dead
        # weight in HBM, a few MB at ml-1m scale)
        self.columns = {k: pad_col(v) for k, v in split.inter.items()}
        # pointwise (CTR) epochs join user/item feature columns ON DEVICE:
        # the tables live in HBM once, each step row-gathers them
        # (`_join_features` semantics, dataloader.py:57-67)
        self.label_field = loader.label_field
        self.user_feat = self.item_feat = None
        if self.mode == "pointwise":
            def feat_dev(feat, id_field):
                if feat is None:
                    return None
                out = {}
                for f, t in feat.items():
                    if f == id_field or f.endswith("_len"):
                        continue
                    t = np.asarray(t)
                    if t.dtype == np.int64:
                        t = t.astype(np.int32)
                    elif t.dtype == np.float64:
                        t = t.astype(np.float32)
                    out[f] = place(t)
                return out or None

            self.user_feat = feat_dev(loader.user_feat, self.uid_field)
            self.item_feat = feat_dev(loader.item_feat, self.iid_field)
        self.B = B
        self.n_steps = n_steps
        self._fn = self._build(trainer, oov, frozen)

    def _build(self, trainer, oov: bool, frozen: bool):
        model, tx = trainer.model, trainer.tx
        B, n_steps = self.B, self.n_steps
        n_items = self.n_items
        uidf, iidf, negf = self.uid_field, self.iid_field, self.neg_field

        spec = getattr(model, "spec", None)
        if oov:
            # static OOV-simulation parameters (inductive/transform.py):
            # per-step option-of-3 padding, per-element id zero-masking,
            # buckets hashed ON DEVICE (ops/inthash_device.py, bit-exact
            # vs the host `hashes.hash_ids`), Bernoulli step keep
            sim = trainer.oov_simulator
            mask_rate = float(sim.mask_rate)
            keep_ratio = float(trainer.oov_train_ratio)
            n_orig_u, n_orig_i = sim.n_users, sim.n_items
            prime_pad = int(spec.prime_pad)
            hash_fn = spec.hash_function
            nub = int(spec.n_user_buckets or 0)
            nib = int(spec.n_item_buckets or 0)
        # DHE/fDHE under `dhe_on_device: true`: the epoch program ships no
        # host-hashed columns — it attaches the uint32 id halves of the
        # EFFECTIVE (prime-padded when OOV-flagged) id per batch and the
        # model SipHashes them on device (ops/siphash_device.py;
        # `dh_embedder.py:122-152` semantics, bit-exact per tests)
        add_dhe = None
        if trainer.dhe_hasher is not None:
            pad64 = int(spec.prime_pad)
            PAD_LO = jnp.uint32(pad64 & 0xFFFFFFFF)
            PAD_HI = jnp.uint32(pad64 >> 32)

            def add_dhe(batch, field, flagged: bool):
                ids = batch.get(field)
                if ids is None:
                    return
                u = ids.astype(jnp.uint32)
                lo, hi = u, jnp.zeros_like(u)
                if flagged:
                    flags = batch.get(field + "_oov")
                    if flags is not None:
                        # 64-bit add emulated as uint32 (lo, hi) pairs —
                        # prime_pad (112062759511) exceeds 32 bits
                        plo = u + PAD_LO
                        carry = (plo < PAD_LO).astype(jnp.uint32)
                        phi = PAD_HI + carry
                        f = flags > 0
                        lo = jnp.where(f, plo, lo)
                        hi = jnp.where(f, phi, hi)
                batch[field + "_dhe_lo"] = lo
                batch[field + "_dhe_hi"] = hi

        freeze_mask = None
        if frozen:
            from oovrec_tpu.train.trainer import _is_oov_param_path

            freeze_mask = jax.tree_util.tree_map_with_path(
                lambda path, _: _is_oov_param_path(path),
                trainer.variables["params"],
            )

        # row-sparse fast path (`learner: sparse_adam`, VERDICT r4 #3):
        # the big ID tables leave the optax sweep — rows are gathered
        # per step (batch `_sparse_rows_*` override, so jax.grad yields
        # ROW gradients with no dense (V, D) cotangent) and lazy-adam
        # advances touched rows only (train/sparse_update.py; optimizer
        # semantics tested equal to the dense scale_by_lazy_adam sweep)
        from oovrec_tpu.train.sparse_update import (
            resolve_sparse_impl, sparse_epoch_table_map,
        )

        sparse_tables = self.sparse_tables = sparse_epoch_table_map(
            trainer, model, spec, frozen
        )
        sparse_impl = self.sparse_impl = None
        if sparse_tables:
            sparse_impl = self.sparse_impl = resolve_sparse_impl(
                trainer.config, trainer.variables["params"],
                sparse_tables,
            )

        R = int(
            trainer.config.get("device_epoch_rounds")
            or _MAX_RESAMPLE_ROUNDS
        )
        CH = 4  # draw rounds per while iteration

        def draw(rng, shape, pop_tab):
            """One round of candidate draws: uniform ids, or the host
            popularity distribution (`sampler.py:78-93`, counts**alpha)
            as an O(1) alias-table draw (data/alias.py)."""
            if pop_tab is None:
                return jax.random.randint(rng, shape, 1, n_items, jnp.int32)
            from oovrec_tpu.data.alias import alias_draw

            return alias_draw(rng, shape, *pop_tab)

        def sample_negs(rng, u, bitmap, pop_tab=None):
            """Bounded masked resampling against the used bitmap —
            `sampler.py:106-126` semantics (keep the FIRST unused of up
            to R draws; give up after R like the host sampler). The
            R-round budget is spent lazily: a bounded while_loop draws CH
            rounds per iteration and exits once every lane resolved —
            with used fractions of a few percent that is one iteration,
            so the bitmap-gather cost is ~CH·n instead of R·n (the R=64
            eager version measured 3× slower end-to-end). Repeatable
            samplers (`RepeatableSampler`, sampler.py:371) skip used-pair
            avoidance entirely — one plain draw. `u` may be any length
            (pointwise times>2 tiles it ×(times-1))."""
            n = u.shape[0]
            if bitmap is None:
                return draw(rng, (n,), pop_tab)
            lanes = jnp.arange(n)

            def test_used(c):
                words = bitmap[u[None, :], c >> 5]
                return ((words >> (c & 31)) & 1) == 1

            def cond(state):
                i, _, ok = state
                return (i < R // CH) & ~jnp.all(ok)

            def body(state):
                i, c, ok = state
                draws = draw(
                    jax.random.fold_in(rng, i), (CH, n), pop_tab
                )
                free = ~test_used(draws)                    # (CH, n)
                any_free = jnp.any(free, axis=0)
                first = jnp.argmax(free, axis=0)
                cand = draws[first, lanes]
                c = jnp.where(~ok & any_free, cand, c)
                return i + 1, c, ok | any_free

            # give-up fallback: rows that stay used after R rounds keep a
            # plain uniform draw (the host keeps its last bad draw)
            c0 = draw(jax.random.fold_in(rng, R), (n,), pop_tab)
            _, c, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), c0, jnp.zeros(n, bool))
            )
            return c

        mesh = trainer.mesh
        jit_kwargs = {"donate_argnums": (0, 2)}
        if mesh is not None:
            # pin the output state to the trainer's committed shardings —
            # without out_shardings GSPMD may return replicated tables,
            # silently undoing the 'model'-axis row sharding
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            extra0 = {
                k: v for k, v in trainer.variables.items() if k != "params"
            }
            jit_kwargs["out_shardings"] = (
                trainer._p_shard,
                jax.tree.map(lambda _: rep, extra0),
                trainer._o_shard,
                rep,
                rep,
            )

        def shard_steps(x):
            """(n_steps, B) → batch axis 'data'-sharded when on a mesh, so
            the SPMD partitioner data-parallelizes every scan step."""
            if mesh is None:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, "data"))
            )

        def oov_transform(t_rng, bu, bi, neg, bw):
            """Device twin of `OOVSimulator.__call__`: option-of-3 flags,
            pre-mask bucket hashing, id zero-masking that clears flags."""
            from oovrec_tpu.ops.inthash_device import sim_buckets_device

            option = jax.random.randint(
                jax.random.fold_in(t_rng, 0), (), 0, 3
            )
            pad_items = (option == 0) | (option == 2)
            pad_users = (option == 1) | (option == 2)
            uflag = jnp.where(pad_users, 1, 0) * jnp.ones(B, jnp.int32)
            iflag = jnp.where(pad_items, 1, 0) * jnp.ones(B, jnp.int32)
            ub = (
                sim_buckets_device(bu, n_orig_u, nub, hash_fn, prime_pad)
                if nub else jnp.zeros(B, jnp.int32)
            )
            ib = (
                sim_buckets_device(bi, n_orig_i, nib, hash_fn, prime_pad)
                if nib else jnp.zeros(B, jnp.int32)
            )
            if mask_rate > 0:
                def m(k):
                    return jax.random.uniform(
                        jax.random.fold_in(t_rng, k), (B,)
                    ) < mask_rate

                mu, mi_, mn = m(1), m(2), m(3)
                bu = jnp.where(mu, 0, bu)
                bi = jnp.where(mi_, 0, bi)
                neg = jnp.where(mn, 0, neg)
                # a zeroed (previously padded) id collapses to IV PAD 0
                uflag = jnp.where(mu, 0, uflag)
                iflag = jnp.where(mi_, 0, iflag)
            return {
                uidf: bu, uidf + "_oov": uflag, uidf + "_bucket": ub,
                iidf: bi, iidf + "_oov": iflag, iidf + "_bucket": ib,
                negf: neg, "weight": bw,
            }

        # epoch arrays ride as EXPLICIT arguments (not jit closures): the
        # implicit-constant path proved fragile when single-device and
        # mesh epoch programs coexist in one process (buffer-count
        # mismatches on executable reuse)
        T = self.times

        @partial(jax.jit, **jit_kwargs)
        def epoch_fn(params, extra_vars, opt_state, estate, rng, step0,
                     columns, weights, bitmap, pop_tab, user_feat,
                     item_feat):
            perm_rng, samp_rng, drop_rng, oov_rng = jax.random.split(rng, 4)
            n_pad = weights.shape[0]
            perm = jax.random.permutation(perm_rng, n_pad)
            cols = {
                k: shard_steps(
                    v[perm].reshape((n_steps, B) + v.shape[1:])
                )
                for k, v in columns.items()
            }
            w = shard_steps(weights[perm].reshape(n_steps, B))
            idxs = step0 + jnp.arange(n_steps, dtype=jnp.int32)

            def train_step(carry, batch, idx):
                params, extra_vars, opt_state = carry

                def loss_fn(p):
                    out, new_vars = model.apply(
                        {"params": p, **extra_vars}, batch, estate,
                        method=model.calculate_loss,
                        rngs={"dropout": jax.random.fold_in(drop_rng, idx)},
                        mutable=["batch_stats"],
                    )
                    return out, new_vars

                (loss, new_vars), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                import optax

                updates, new_opt_state = tx.update(grads, opt_state, params)
                if freeze_mask is not None:
                    from oovrec_tpu.train.trainer import _select_opt_state

                    updates = jax.tree.map(
                        lambda fm, up: up if fm else jnp.zeros_like(up),
                        freeze_mask, updates,
                    )
                    new_opt_state = _select_opt_state(
                        freeze_mask, opt_state, new_opt_state
                    )
                new_params = optax.apply_updates(params, updates)
                if "batch_stats" in new_vars:
                    extra_vars = dict(
                        extra_vars, batch_stats=new_vars["batch_stats"]
                    )
                return (new_params, extra_vars, new_opt_state), loss

            if sparse_tables:
                stm = sparse_tables
                table_names = {name for name, _f in stm.values()}
                lr = trainer.learning_rate
                from oovrec_tpu.train.sparse_update import (
                    gather_rows_for_batch,
                    merge_lazy_opt_state,
                    merge_tables,
                    prune_tables,
                    sparse_adam_update_table,
                    split_lazy_opt_state,
                )

                def train_step(carry, batch, idx):  # noqa: F811
                    params, extra_vars, opt_state = carry
                    rows, nb, gathered = gather_rows_for_batch(
                        params, batch, stm
                    )
                    rest = prune_tables(params, table_names)
                    tables = {
                        k: params[k]["embedding"] for k in table_names
                    }

                    def loss_fn(rows, rest):
                        full = merge_tables(rest, tables)
                        b2 = dict(nb)
                        for side in rows:
                            b2["_sparse_rows_" + side] = rows[side]
                        out, new_vars = model.apply(
                            {"params": full, **extra_vars}, b2, estate,
                            method=model.calculate_loss,
                            rngs={"dropout": jax.random.fold_in(
                                drop_rng, idx)},
                            mutable=["batch_stats"],
                        )
                        return out, new_vars

                    import optax

                    (loss, new_vars), (g_rows, g_rest) = (
                        jax.value_and_grad(
                            loss_fn, argnums=(0, 1), has_aux=True
                        )(rows, rest)
                    )
                    rest_state, sparse_states = split_lazy_opt_state(
                        opt_state, table_names, stm
                    )
                    updates, new_rest_state = tx.update(
                        g_rest, rest_state, rest
                    )
                    new_rest = optax.apply_updates(rest, updates)
                    count2 = new_rest_state[0].count
                    new_tabs = {}
                    new_sparse = {}
                    for side, (name, _f) in stm.items():
                        tbl2, st2 = sparse_adam_update_table(
                            tables[name], sparse_states[side],
                            gathered[side], g_rows[side], count2, lr,
                            impl=sparse_impl,
                        )
                        new_tabs[name] = tbl2
                        new_sparse[side] = st2
                    new_params = merge_tables(new_rest, new_tabs)
                    new_opt_state = merge_lazy_opt_state(
                        new_rest_state, new_sparse, stm
                    )
                    if "batch_stats" in new_vars:
                        extra_vars = dict(
                            extra_vars,
                            batch_stats=new_vars["batch_stats"],
                        )
                    return (new_params, extra_vars, new_opt_state), loss

            def body(carry, xs):
                bc, bw, idx = xs
                if self.mode == "plain":
                    batch = dict(bc, weight=bw)
                    carry, loss = train_step(carry, batch, idx)
                    return carry, loss
                bu, bi = bc[uidf], bc[iidf]
                if self.mode == "pairwise":
                    neg = sample_negs(
                        jax.random.fold_in(samp_rng, idx), bu, bitmap,
                        pop_tab,
                    )
                if self.mode == "pointwise":
                    # host layout (dataloader.py:229-244): every inter
                    # column tiled ×T, item column = [positives ∥
                    # neg.flatten(order='F')] — (T-1) negatives per
                    # positive — generated 1/0 labels, features joined
                    # per row
                    neg = sample_negs(
                        jax.random.fold_in(samp_rng, idx),
                        jnp.tile(bu, T - 1), bitmap, pop_tab,
                    )
                    batch = {
                        k: jnp.concatenate([v] * T) for k, v in bc.items()
                    }
                    ids_i = jnp.concatenate([bi, neg])
                    ids_u = jnp.tile(bu, T)
                    batch[iidf] = ids_i
                    batch[self.label_field] = jnp.concatenate(
                        [bw, jnp.zeros((T - 1) * B, bw.dtype)]
                    )
                    batch["weight"] = jnp.tile(bw, T)
                    if user_feat:
                        for f, t in user_feat.items():
                            batch[f] = t[ids_u]
                    if item_feat:
                        for f, t in item_feat.items():
                            batch[f] = t[ids_i]
                    if add_dhe is not None:
                        add_dhe(batch, uidf, flagged=False)
                        add_dhe(batch, iidf, flagged=False)
                    carry, loss = train_step(carry, batch, idx)
                    return carry, loss
                if not oov:
                    batch = dict(bc, weight=bw)
                    batch[negf] = neg
                    if add_dhe is not None:
                        add_dhe(batch, uidf, flagged=False)
                        add_dhe(batch, iidf, flagged=False)
                        add_dhe(batch, negf, flagged=False)
                    carry, loss = train_step(carry, batch, idx)
                    return carry, loss
                t_rng = jax.random.fold_in(oov_rng, idx)
                extras = {k: v for k, v in bc.items()
                          if k not in (uidf, iidf)}
                batch = dict(extras, **oov_transform(t_rng, bu, bi, neg, bw))
                if add_dhe is not None:
                    # after the OOV transform: hash the padded id when
                    # flagged (host annotate_batch order,
                    # `feat_dh_embedder.py:190-197`); the neg column
                    # carries no OOV flag — raw id, like the host path
                    add_dhe(batch, uidf, flagged=True)
                    add_dhe(batch, iidf, flagged=True)
                    add_dhe(batch, negf, flagged=False)
                # Bernoulli batch keep (`trainer.py:1796` semantics)
                kept = jax.random.uniform(
                    jax.random.fold_in(t_rng, 7)
                ) <= keep_ratio
                return jax.lax.cond(
                    kept,
                    lambda c: train_step(c, batch, idx),
                    lambda c: (c, jnp.float32(0.0)),
                    carry,
                )

            (params, extra_vars, opt_state), losses = jax.lax.scan(
                body, (params, extra_vars, opt_state), (cols, w, idxs)
            )
            return params, extra_vars, opt_state, jnp.sum(losses), losses

        return epoch_fn

    def run(self, params, extra_vars, opt_state, estate, rng, step0: int):
        if not jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
            rng = jax.random.wrap_key_data(rng)  # raw uint32[2] callers
        args = (
            params, extra_vars, opt_state, estate, rng, jnp.int32(step0),
            self.columns, self.weights, self.bitmap, self.pop_tab,
            self.user_feat, self.item_feat,
        )
        return self._fn(*args)


def device_epoch_eligible(trainer, loader, config) -> bool:
    from oovrec_tpu.data.dataloader import TrainBatcher
    from oovrec_tpu.data.transform import Equal

    flag = config.get("device_epoch", "auto")
    if flag is False:
        return False
    if not isinstance(loader, TrainBatcher):
        return False
    import jax as _jax

    # multi-host (pod slice): every process holds the full split, so the
    # whole-epoch program compiles SPMD across all hosts' devices — the
    # fast path no longer degrades to the host pipeline on a pod. A mesh
    # is required once process_count > 1 (cross-host collectives need
    # committed shardings).
    if _jax.process_count() > 1 and trainer.mesh is None:
        return False
    mesh_ok = trainer.mesh is None or (
        loader.step % trainer.mesh.shape["data"] == 0
    )
    # `supports_device_epoch` on the model asserts its loss consumes only
    # split columns (+ sampled negatives in pairwise mode, + joined
    # feature columns in pointwise mode — which ARE provided on device).
    # uniform AND popularity draws both run on device (popularity is an
    # inverse-CDF draw against the host sampler's cumsum — same
    # distribution, device threefry stream); dynamic hard negatives need
    # the live-params scorer per batch and stay on the host pipeline
    dist_ok = getattr(loader.sampler, "distribution", None) in (
        "uniform", "popularity",
    )
    if loader.mode == "pairwise":
        sampling_ok = loader.times == 1 and not loader.dynamic and dist_ok
    elif loader.mode == "pointwise":
        # (times-1) negatives per positive, any times >= 2
        sampling_ok = loader.times >= 2 and not loader.dynamic and dist_ok
    elif loader.mode == "plain":
        sampling_ok = True  # no negatives drawn (seq CE / plain losses)
    else:
        sampling_ok = False
    # DHE/fDHE: eligible when hashing runs on device (`dhe_on_device`) —
    # the epoch program attaches id halves itself; host-side hashing
    # (memoized numpy SipHash) still forces the host pipeline
    dhe_ok = trainer.dhe_hasher is None or trainer.dhe_hasher.on_device
    ok = (
        sampling_ok
        and isinstance(loader.transform, Equal)
        and mesh_ok
        and dhe_ok
        and getattr(trainer.model, "supports_device_epoch", False)
    )
    if not ok:
        return False
    if flag == "auto":
        return len(loader.split) >= AUTO_MIN_ROWS
    return bool(flag)
