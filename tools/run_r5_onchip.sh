#!/bin/bash
# Round-5 on-chip campaign (run when the tunnel is alive):
#  1. alias-table popularity epoch vs uniform at the 10M corpus
#     (VERDICT r4 #7 "Done =" popularity <= 2x uniform)
#  2. DIEN aux-negative A/B: presampled (DIENDataset semantics) vs
#     on-device fresh draws, 2 seeds, ml-1m-scale corpus (VERDICT r4 #8)
# Logs under /tmp/r5/.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5

SYNTH10M=dataset/synth10m-ind
if [ ! -d "$SYNTH10M" ]; then
  python tools/make_synth_dataset.py --out=dataset --name=synth10m-ind \
    --users=60000 --items=20000 --inters=10000000
fi

LOAD="--load_col={'inter': ['user_id','item_id','timestamp','is_new'], 'user': ['user_id','age','group','user_vector'], 'item': ['item_id','price','category','item_vector']}"

# 1a. uniform fast-path epochs (baseline timing)
timeout 3000 python - <<'EOF' > /tmp/r5/pop_uniform.log 2>&1
import time
from oovrec_tpu.cli.quick_start import run
cfg = dict(
    model="BPR", dataset="synth10m-ind", data_path="dataset",
    load_col={"inter": ["user_id", "item_id", "timestamp", "is_new"],
              "user": ["user_id", "age", "group", "user_vector"],
              "item": ["item_id", "price", "category", "item_vector"]},
    epochs=3, train_batch_size=8192, embedding_size=64,
    eval_args={"split": {"RS": [0.88, 0.02, 0.1]}, "order": "TO",
               "group_by": "user", "mode": "uni250"},
    topk=[10, 20], valid_metric="MRR@20", eval_step=10,
    device_epoch=True, seed=3,
    train_neg_sample_args={"distribution": "uniform", "sample_num": 1},
)
res = run(config_dict=cfg, saved=False)
print("LOSSES", [round(float(v), 1) for v in res["trainer"].train_loss_dict.values()])
EOF

# 1b. popularity fast-path epochs (alias table)
timeout 3000 python - <<'EOF' > /tmp/r5/pop_alias.log 2>&1
from oovrec_tpu.cli.quick_start import run
cfg = dict(
    model="BPR", dataset="synth10m-ind", data_path="dataset",
    load_col={"inter": ["user_id", "item_id", "timestamp", "is_new"],
              "user": ["user_id", "age", "group", "user_vector"],
              "item": ["item_id", "price", "category", "item_vector"]},
    epochs=3, train_batch_size=8192, embedding_size=64,
    eval_args={"split": {"RS": [0.88, 0.02, 0.1]}, "order": "TO",
               "group_by": "user", "mode": "uni250"},
    topk=[10, 20], valid_metric="MRR@20", eval_step=10,
    device_epoch=True, seed=3,
    train_neg_sample_args={"distribution": "popularity", "sample_num": 1,
                           "alpha": 1.0},
)
res = run(config_dict=cfg, saved=False)
print("LOSSES", [round(float(v), 1) for v in res["trainer"].train_loss_dict.values()])
EOF
grep -E "epoch .* time" /tmp/r5/pop_uniform.log /tmp/r5/pop_alias.log | tail -8

# 2. DIEN aux-negative A/B (quality equivalence of the on-device default)
for mode in presampled on_device; do
  for seed in 2020 2021; do
    timeout 3000 python -m oovrec_tpu.cli.run --model=DIEN --dataset=bench-ml1m \
      --data_path=dataset \
      "--load_col={'inter': ['user_id','item_id','rating','timestamp']}" \
      --epochs=3 --train_batch_size=2048 --embedding_size=64 \
      --mlp_hidden_size="[64,64]" --att_hidden="[32]" --alpha=1.0 \
      --dien_neg_sampling=$mode --device_epoch=auto \
      "--eval_args={'split': {'LS': 'valid_and_test'}, 'order': 'TO', 'group_by': 'user', 'mode': 'uni100'}" \
      "--train_neg_sample_args={'distribution': 'uniform', 'sample_num': 1}" \
      --topk="[10,20]" --valid_metric=MRR@10 --seed=$seed \
      --results_json=/tmp/r5/dien_${mode}_${seed}.json \
      > /tmp/r5/dien_${mode}_${seed}.log 2>&1
    echo "dien $mode $seed rc=$?"
  done
done
