#!/bin/bash
# Round-5 queue v9c — continuation of v9 after the --data_dir subprocess fix.
# v9's Y1 loaded 0 files (medium_baselines_table.py dropped --data_dir in its
# per-model subprocess dispatch — fixed in the same commit that adds this
# queue); v9 was stop-filed after its running Y2 datagen. This queue waits for
# v9 to drain, then runs the corrected sequence: Y1 tiny baselines (fixtures)
# -> Y3 mini medium baselines multistep -> Y4 mini medium GDE h=1 multistep ->
# bench preflight. Stop with: touch /tmp/r5_queue_v9c_stop
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
TINY=tarware-tiny-3agvs-2pickers-partialobs-v1
MED=tarware-medium-19agvs-9pickers-partialobs-v1
FIX=/root/repo/tests/fixtures/datasets
QLOG=/tmp/r5_queue.log
RD=results_data
HARD_DEADLINE=$(date -ud "2026-08-20 05:48" +%s)

stage() {  # stage <name> <cap_seconds> <cmd...>
  local name=$1 cap=$2; shift 2
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  [ "$budget" -gt "$cap" ] && budget=$cap
  if [ -f /tmp/r5_queue_v9c_stop ] || [ "$budget" -le 120 ]; then
    echo "=== $(date -u +%H:%M:%S) v9c stage $name SKIPPED (stop/deadline)" >> $QLOG
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) v9c stage $name (budget ${budget}s): $*" >> $QLOG
  timeout -s TERM "$budget" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) v9c stage $name exit $?" >> $QLOG
}

harvest() {
  python3 scripts/harvest_results.py >> $QLOG 2>&1
  git add results_data 2>/dev/null
  git commit -q -m "r5 queue: harvest stage artifacts" 2>/dev/null || true
}

# Gate on v9 draining (its running Y2 datagen must finish; stop file skips
# the rest). Poll the specific pid, not a pattern.
V9PID=$(cat /tmp/r5_queue_v9.pid 2>/dev/null)
while [ -n "$V9PID" ] && kill -0 "$V9PID" 2>/dev/null; do sleep 5; done

echo "=== $(date -u +%H:%M:%S) r5 queue v9c start (v9 drained)" >> $QLOG

# --- Y1. tiny baselines from the committed fixtures (item 9) -----------------
if [ ! -f $RD/sizes/baselines_tiny__multistep.json ]; then
  stage Y1_baselines_tiny 1100 python3 experiments/medium_baselines_table.py \
    --env "$TINY" --data_dir "$FIX" --epochs 30 --save_params \
    --out_dir /root/repo/runs/baselines_tiny \
    --gde_result /root/repo/runs/gde_tiny_ref_h4/result.json
  stage Y1b_baselines_tiny_ms 420 python3 experiments/baselines_multistep.py \
    --env "$TINY" --data_dir "$FIX" \
    --params_dir /root/repo/runs/baselines_tiny
  harvest
fi

# --- Y3. mini-recipe medium baselines multistep row (item 9, labeled) ---------
if [ -f datasets/warehouse_data_${MED}_seed4000.h5 ] && \
   [ ! -f $RD/sizes/baselines_medium_mini__multistep.json ]; then
  stage Y3_baselines_med_mini 1200 python3 experiments/medium_baselines_table.py \
    --env "$MED" --models lstm pos_gru pos_lstm --epochs 10 --save_params \
    --out_dir /root/repo/runs/baselines_medium_mini \
    --gde_result /root/repo/runs/gde_medium_ref_h4w/result.json
  stage Y3b_baselines_med_ms 420 python3 experiments/baselines_multistep.py \
    --env "$MED" --params_dir /root/repo/runs/baselines_medium_mini
  harvest
fi

# --- Y4. mini-recipe medium GDE h=1 multistep row (item 9, labeled) -----------
if [ -f datasets/warehouse_data_${MED}_seed4000.h5 ] && \
   [ ! -f $RD/sizes/gde_medium_ref_h1mini__multistep.json ]; then
  stage Y4_gde_med_h1mini 1100 python3 experiments/medium_gde_ref_scale.py \
    --env "$MED" --epochs 12 --horizon 1 --checkpoint_every 2 \
    --scan_chunk 1500 --out_dir /root/repo/runs/gde_medium_ref_h1mini
  stage Y4b_gde_med_h1mini_ms 420 python3 experiments/gde_multistep.py \
    --env "$MED" --run_dir /root/repo/runs/gde_medium_ref_h1mini
  harvest
fi

# --- Z. bench preflight (driver runs the recorded bench after the round) ------
HARD_DEADLINE=$(( $(date +%s) + 650 ))
stage Zv9c_bench 600 python3 bench.py
harvest
echo "=== $(date -u +%H:%M:%S) r5 queue v9c done" >> $QLOG
