#!/bin/bash
# Round-3 on-chip jobs, run once when the TPU tunnel is reachable:
#   1. bench.py — driver-format perf artifact with roofline (MFU /
#      HBM-utilization) fields; a successful run also seeds
#      bench_last_good.json so later tunnel outages degrade the
#      evidence to "stale, labeled" instead of erasing it.
#   2. the full inductive protocol at 10M rows (VERDICT round-2 #8):
#      BPR zero baseline + lsh with OOV sub-epochs, device-resident
#      epochs, checkpoint, _ind vocab reconciliation, fused 7-slice
#      inductive eval. Corpus: tools/make_synth_dataset.py
#      --name=synth10m-ind --users=60000 --items=20000 --inters=10000000.
set -u
cd /root/repo
mkdir -p /tmp/r3

LOAD_COL="--load_col={'inter': ['user_id','item_id','timestamp','is_new'], 'user': ['user_id','age','group','user_vector'], 'item': ['item_id','price','category','item_vector']}"

echo "[r3] bench start $(date -u +%H:%M:%S)"
timeout 2400 python bench.py > /tmp/r3/bench.json 2> /tmp/r3/bench.err
echo "[r3] bench done $(date -u +%H:%M:%S): $(cat /tmp/r3/bench.json)"

for emb in zero lsh; do
  extra=""
  if [ "$emb" != zero ]; then
    extra="--train_oov=True --oov_train_ratio=0.3"
  fi
  echo "[r3] ind10m $emb start $(date -u +%H:%M:%S)"
  timeout 7200 python -m oovrec_tpu.cli.run --model=BPR \
    --dataset=synth10m-ind "$LOAD_COL" \
    --epochs=5 --inductive_embedder=$emb --add_oov_buckets=True \
    --n_user_oov_buckets=500 --n_item_oov_buckets=500 $extra \
    --train_batch_size=8192 --embedding_size=64 \
    --inductive_eval=True --save_dataset=True \
    --checkpoint_dir=/tmp/r3/saved \
    > /tmp/r3/ind10m_$emb.log 2>&1
  echo "[r3] ind10m $emb done $(date -u +%H:%M:%S) rc=$?"
done
echo "[r3] all done $(date -u +%H:%M:%S)"
