#!/bin/bash
# Round-5 queue v8 — post-reset final hour (Aug 20 02:10 UTC session).
# The 01:45 VM reset killed v7 and wiped datasets/ + runs/ again. With ~1h
# of chip left, v7's heavy medium chain (DAgger -> honest-T -> MAPPO warm,
# h=1 GDE restore) cannot complete AND commit in time, so this queue runs
# only stages that finish inside the hour, cheapest/most-certain first:
#   XT  tiny GDE h4 row from the committed fixture datasets (item 9)
#   XA  extralarge mini datagen, seeds 0+4000 x 60 eps      (item 7)
#   XB  extralarge GDE h4 12 epochs + multistep row         (item 7)
#   XC  extralarge QMIX 800 episodes                        (item 7)
#   Z   final bench
# Commits after every block. Stop with: touch /tmp/r5_queue_v8_stop
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
TINY=tarware-tiny-3agvs-2pickers-partialobs-v1
XL=tarware-extralarge-19agvs-9pickers-partialobs-v1
QLOG=/tmp/r5_queue.log
RD=results_data
HARD_DEADLINE=$(date -ud "2026-08-20 03:25" +%s)

stage() {  # stage <name> <cap_seconds> <cmd...>
  local name=$1 cap=$2; shift 2
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  [ "$budget" -gt "$cap" ] && budget=$cap
  if [ -f /tmp/r5_queue_v8_stop ] || [ "$budget" -le 120 ]; then
    echo "=== $(date -u +%H:%M:%S) v8 stage $name SKIPPED (stop/deadline)" >> $QLOG
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) v8 stage $name (budget ${budget}s): $*" >> $QLOG
  timeout -s TERM "$budget" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) v8 stage $name exit $?" >> $QLOG
}

harvest() {
  python3 scripts/harvest_results.py >> $QLOG 2>&1
  git add results_data 2>/dev/null
  git commit -q -m "r5 queue: harvest stage artifacts" 2>/dev/null || true
}

echo "=== $(date -u +%H:%M:%S) r5 queue v8 start" >> $QLOG

# --- XT. tiny GDE row from the committed fixture datasets (item 9) -----------
if [ ! -f $RD/sizes/gde_tiny_ref_h4__multistep.json ]; then
  stage XT_gde_tiny 900 python3 experiments/medium_gde_ref_scale.py \
    --env "$TINY" --data_dir /root/repo/tests/fixtures/datasets \
    --epochs 30 --horizon 4 --checkpoint_every 5 --scan_chunk 2000 \
    --out_dir /root/repo/runs/gde_tiny_ref_h4
  stage XT_gde_tiny_ms 600 python3 experiments/gde_multistep.py \
    --env "$TINY" --data_dir /root/repo/tests/fixtures/datasets \
    --run_dir /root/repo/runs/gde_tiny_ref_h4
  harvest
fi

# --- X. extralarge mini end-to-end leg (item 7) -------------------------------
if [ ! -f $RD/sizes/gde_extralarge_ref_h4__multistep.json ]; then
  ls datasets/warehouse_data_${XL}_seed*.h5 >/dev/null 2>&1 || \
    stage XA_datagen_xl 1500 python3 scripts/collect_data.py \
      --env_ids "$XL" --seeds 0 4000 --num_episodes 60 --batch 30 \
      --out_dir datasets
  # seed 4000 included deliberately: gde_multistep.py evaluates on the
  # seed4000 file (held-out-ish slice, same convention as medium).
  stage XB_gde_xl_h4 1800 python3 experiments/medium_gde_ref_scale.py \
    --env "$XL" --epochs 12 --horizon 4 --checkpoint_every 2 \
    --scan_chunk 1000 --device_shard_episodes 250 \
    --out_dir /root/repo/runs/gde_extralarge_ref_h4
  stage XB2_gde_xl_ms 900 python3 experiments/gde_multistep.py \
    --env "$XL" --run_dir /root/repo/runs/gde_extralarge_ref_h4
  harvest
fi
if [ ! -f $RD/qmix_xl.jsonl ] && \
   ls datasets/warehouse_data_${XL}_seed*.h5 >/dev/null 2>&1; then
  stage XC_qmix_xl 1200 python3 experiments/medium_qmix_5k.py \
    --env_id "$XL" --num_episodes 800 --coordinated \
    --eval_every 200 --eval_episodes 8 --tag xl
  cp -f runs/qmix_medium_5k_xl/qmix_medium_5k.jsonl \
    $RD/qmix_xl.jsonl 2>/dev/null
  harvest
fi

# --- Z. final bench ------------------------------------------------------------
HARD_DEADLINE=$(( $(date +%s) + 700 ))
stage Zv8_bench 600 python3 bench.py
harvest
echo "=== $(date -u +%H:%M:%S) r5 queue v8 done" >> $QLOG

# --- appended 02:30: XL baselines rows with the spare chip time --------------
HARD_DEADLINE=$(date -ud "2026-08-20 03:20" +%s)
if [ ! -f $RD/sizes/baselines_extralarge__results.json ]; then
  stage XD_baselines_xl 1500 python3 experiments/medium_baselines_table.py \
    --env "$XL" --models gru pos_gru --epochs 15 --hidden_dim 128 \
    --save_params --out_dir /root/repo/runs/baselines_extralarge \
    --gde_result /root/repo/runs/gde_extralarge_ref_h4/result.json
  stage XD2_baselines_xl_ms 800 python3 experiments/baselines_multistep.py \
    --env "$XL" --params_dir /root/repo/runs/baselines_extralarge
  harvest
fi
echo "=== $(date -u +%H:%M:%S) r5 queue v8 appended tail done" >> $QLOG
