"""Knowledge-based dataset (`recbole/data/dataset/kg_dataset.py:1-613` analog).

Loads two extra atomic files:
  <ds>.kg    head_id:token  relation_id:token  tail_id:token
  <ds>.link  item_id:token  entity_id:token

Entity remapping follows the reference: items and entities share one id
space — linked items keep their item ids, non-item entities continue after
them, so `entity_embedding[:n_items]` aligns with item ids. Relations get
their own space with a reverse-relation offset option and a trailing
[UI-Relation] id.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd

from oovrec_tpu.data.atomic import load_atomic_file
from oovrec_tpu.data.dataset import Dataset
from oovrec_tpu.utils.enums import FeatureSource, FeatureType


class KnowledgeBasedDataset(Dataset):
    def __init__(self, config):
        self.head_field = config.get("HEAD_ENTITY_ID_FIELD", "head_id")
        self.tail_field = config.get("TAIL_ENTITY_ID_FIELD", "tail_id")
        self.relation_field = config.get("RELATION_ID_FIELD", "relation_id")
        self.entity_field = config.get("ENTITY_ID_FIELD", "entity_id")
        self.kg_feat: pd.DataFrame = None
        self.link_df: pd.DataFrame = None
        super().__init__(config)

    def _load_data(self) -> None:
        super()._load_data()
        path = self._dataset_path()
        token = self.dataset_name
        sep = self.config["field_separator"]
        seq_sep = self.config["seq_separator"]
        kg_path = os.path.join(path, f"{token}.kg")
        link_path = os.path.join(path, f"{token}.link")
        if not os.path.isfile(kg_path) or not os.path.isfile(link_path):
            raise ValueError(f"{token}.kg / {token}.link files are required")
        self.kg_feat, f2t = load_atomic_file(kg_path, sep, seq_sep)
        for f, t in f2t.items():
            self.field2source[f] = FeatureSource.KG
            self.field2type[f] = t
        self.link_df, _ = load_atomic_file(link_path, sep, seq_sep)

    # ------------------------------------------------------------ filtering

    def _data_filtering(self) -> None:
        super()._data_filtering()
        self._filter_kg_by_triple_num()
        self._filter_link()

    def _filter_kg_by_triple_num(self) -> None:
        """Entity/relation k-core over triples
        (`kg_dataset.py:97-166`)."""
        from oovrec_tpu.data.dataset import _in_interval, _parse_interval

        e_iv = _parse_interval(self.config["entity_kg_num_interval"])
        r_iv = _parse_interval(self.config["relation_kg_num_interval"])
        if not e_iv and not r_iv:
            return
        kg = self.kg_feat
        import numpy as np

        while True:
            n = len(kg)
            if e_iv:
                import pandas as pd

                cnt = pd.concat(
                    [kg[self.head_field], kg[self.tail_field]]
                ).value_counts()
                bad = set(cnt.index[
                    ~_in_interval(cnt.values.astype(np.float64), e_iv)
                ])
                if bad:
                    kg = kg[~kg[self.head_field].isin(bad)
                            & ~kg[self.tail_field].isin(bad)]
            if r_iv:
                cnt = kg[self.relation_field].value_counts()
                bad = set(cnt.index[
                    ~_in_interval(cnt.values.astype(np.float64), r_iv)
                ])
                if bad:
                    kg = kg[~kg[self.relation_field].isin(bad)]
            if len(kg) == n:
                break
        self.kg_feat = kg.reset_index(drop=True)

    def _filter_link(self) -> None:
        """Drop link rows whose entity is not in the KG or item not in
        the interactions; then — fork behavior — drop interaction rows
        whose item has NO entity link (`kg_dataset.py:168-188`)."""
        ents = set(self.kg_feat[self.head_field].astype(str)) | set(
            self.kg_feat[self.tail_field].astype(str)
        )
        items = set(self.inter_feat[self.iid_field].astype(str))
        ld = self.link_df
        keep = ld[self.entity_field].astype(str).isin(ents) & ld[
            self.iid_field
        ].astype(str).isin(items)
        self.link_df = ld[keep].reset_index(drop=True)
        linked = set(self.link_df[self.iid_field].astype(str))
        self.inter_feat = self.inter_feat[
            self.inter_feat[self.iid_field].astype(str).isin(linked)
        ].reset_index(drop=True)

    def _remap_id_all(self) -> None:
        # items first (standard remap incl. users/other fields)
        super()._remap_id_all()

        # entity space: linked items keep item ids; other entities follow
        item_t2i = self.field2token_id[self.iid_field]
        link: Dict[str, str] = dict(
            zip(
                self.link_df[self.entity_field].values.astype(str),
                self.link_df[self.iid_field].values.astype(str),
            )
        )
        ent2id: Dict[str, int] = {}
        for ent, item_tok in link.items():
            if item_tok in item_t2i:
                ent2id[ent] = item_t2i[item_tok]
        next_id = self.item_num
        heads = self.kg_feat[self.head_field].values.astype(str)
        tails = self.kg_feat[self.tail_field].values.astype(str)
        for tok in np.concatenate([heads, tails]):
            if tok not in ent2id:
                ent2id[tok] = next_id
                next_id += 1
        self._entity2id = ent2id
        self.entity_num = next_id
        self.kg_feat[self.head_field] = np.array(
            [ent2id[t] for t in heads], np.int64
        )
        self.kg_feat[self.tail_field] = np.array(
            [ent2id[t] for t in tails], np.int64
        )

        # relation space: PAD 0, originals, optional reversed copies
        # (`kg_reverse_r`, reference `_add_auxiliary_relation`
        # `kg_dataset.py:366-397`: reversed id = original + n_originals),
        # trailing [UI-Relation]
        rels = self.kg_feat[self.relation_field].values.astype(str)
        uniq, inv = np.unique(rels, return_inverse=True)
        self.kg_feat[self.relation_field] = inv + 1
        vocab = ["[PAD]"] + list(uniq)
        if self.config["kg_reverse_r"]:
            n_orig = len(uniq)
            rev = pd.DataFrame({
                self.head_field: self.kg_feat[self.tail_field].values,
                self.relation_field:
                    self.kg_feat[self.relation_field].values + n_orig,
                self.tail_field: self.kg_feat[self.head_field].values,
            })
            self.kg_feat = pd.concat(
                [self.kg_feat, rev], ignore_index=True
            )
            vocab += [t + "_r" for t in uniq]
        vocab.append("[UI-Relation]")
        self.field2id_token[self.relation_field] = np.array(vocab)
        self.field2token_id[self.relation_field] = {
            t: i for i, t in enumerate(vocab)
        }
        self.relation_num = len(vocab)

    @property
    def kg_triples(self):
        return (
            self.kg_feat[self.head_field].values.astype(np.int64),
            self.kg_feat[self.relation_field].values.astype(np.int64),
            self.kg_feat[self.tail_field].values.astype(np.int64),
        )

    def num(self, field: str) -> int:
        if field == self.entity_field or field in (self.head_field, self.tail_field):
            return self.entity_num
        if field == self.relation_field:
            return self.relation_num
        return super().num(field)
