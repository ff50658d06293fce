#!/bin/bash
# Round-4 on-chip jobs (run when the TPU tunnel is reachable):
#   1. bench.py — full driver-format artifact (roofline + envelope
#      fields + host-pipeline number with host-scan dispatch).
#   2. the 10M inductive protocol (BPR zero, 5 epochs) with per-epoch
#      wall-clock logging — the round-4 "Done =" checks: uni250 valid
#      epoch wall-clock with the vectorized+cached candidate loader
#      (r3: 190-255 s/epoch) and the popularity-sampling device epoch.
#   3. a popularity-distribution training run (previously host-pipeline
#      only) to show the widened device-epoch eligibility on chip.
set -u
cd /root/repo
mkdir -p /tmp/r4

LOAD_COL="--load_col={'inter': ['user_id','item_id','timestamp','is_new'], 'user': ['user_id','age','group','user_vector'], 'item': ['item_id','price','category','item_vector']}"

echo "[r4] bench start $(date -u +%H:%M:%S)"
timeout 2400 python bench.py > /tmp/r4/bench.json 2> /tmp/r4/bench.err
echo "[r4] bench done $(date -u +%H:%M:%S): $(cat /tmp/r4/bench.json)"

echo "[r4] ind10m zero start $(date -u +%H:%M:%S)"
timeout 7200 python -m oovrec_tpu.cli.run --model=BPR \
  --dataset=synth10m-ind "$LOAD_COL" \
  --epochs=5 --inductive_embedder=zero --add_oov_buckets=True \
  --n_user_oov_buckets=500 --n_item_oov_buckets=500 \
  --train_batch_size=8192 --embedding_size=64 \
  --inductive_eval=True --save_dataset=True \
  --checkpoint_dir=/tmp/r4/saved \
  > /tmp/r4/ind10m_zero.log 2>&1
echo "[r4] ind10m zero done $(date -u +%H:%M:%S) rc=$?"
grep -E "epoch .* (training|evaluating)" /tmp/r4/ind10m_zero.log | tail -12

echo "[r4] popularity device-epoch start $(date -u +%H:%M:%S)"
timeout 3600 python -m oovrec_tpu.cli.run --model=BPR \
  --dataset=synth10m-ind "$LOAD_COL" \
  --epochs=3 --inductive_embedder=zero \
  "--train_neg_sample_args={'distribution': 'popularity', 'sample_num': 1, 'alpha': 1.0}" \
  --train_batch_size=8192 --embedding_size=64 --save_dataset=True \
  --oov_debug_skip_eval=True --checkpoint_dir=/tmp/r4/saved_pop \
  > /tmp/r4/ind10m_pop.log 2>&1
echo "[r4] popularity done $(date -u +%H:%M:%S) rc=$?"
grep -E "epoch .* training" /tmp/r4/ind10m_pop.log | tail -4
echo "[r4] all done $(date -u +%H:%M:%S)"
