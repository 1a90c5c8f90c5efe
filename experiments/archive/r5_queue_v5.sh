#!/bin/bash
# Round-5 queue v5 — re-prioritized tail for the final hours.
# v4's natural order after HT5 is L -> K -> A2 -> G6 -> HT6 -> H(MAPPO),
# which under the 01:15 deadline would land none of them. This queue:
#   1. lets v4 finish A (datagen), G5 (DAgger medium), HT5 (honest-T medium)
#      — the VERDICT item-6 adjudication, the round's top ask;
#   2. then stops v4 (stop file; v4 re-benches and exits) and spends the
#      remaining chip on MAPPO (item 8: the only algorithm with zero
#      committed numbers) and the medium baselines + GDE h=1 multistep
#      restore (item 9's most-cited rows), committing after each block.
# The large-DAgger leg (HT6) is the explicit cut: the medium adjudication
# settles the protocol question and the large claim already carries its
# probe-scale caveat in RESULTS.md.
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
QLOG=/tmp/r5_queue.log
RD=results_data
HARD_DEADLINE=$(date -ud "2026-08-20 02:20" +%s)

stage() {  # stage <name> <cap_seconds> <cmd...>
  local name=$1 cap=$2; shift 2
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  [ "$budget" -gt "$cap" ] && budget=$cap
  if [ -f /tmp/r5_queue_v5_stop ] || [ "$budget" -le 120 ]; then
    echo "=== $(date -u +%H:%M:%S) v5 stage $name SKIPPED (stop/deadline)" >> $QLOG
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) v5 stage $name (budget ${budget}s): $*" >> $QLOG
  timeout -s TERM "$budget" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) v5 stage $name exit $?" >> $QLOG
}

harvest() {
  python3 scripts/harvest_results.py >> $QLOG 2>&1
  git add results_data 2>/dev/null
  git commit -q -m "r5 queue: harvest stage artifacts" 2>/dev/null || true
}

# --- gate: wait for v4's HT5 artifact (or v4's own exit / timeout) ----------
V4=$(cat /tmp/r5_queue_v4.pid 2>/dev/null)
CUTOFF=$(date -ud "2026-08-20 01:05" +%s)
while kill -0 "$V4" 2>/dev/null \
      && [ ! -f $RD/honest_t_medium_r5.json ] \
      && [ "$(date +%s)" -lt "$CUTOFF" ]; do sleep 30; done
echo "=== $(date -u +%H:%M:%S) v5 gate passed (honest_t=$(ls $RD/honest_t_medium_r5.json 2>/dev/null))" >> $QLOG
touch /tmp/r5_queue_stop
while kill -0 "$V4" 2>/dev/null; do sleep 20; done
echo "=== $(date -u +%H:%M:%S) v5 owns the chip (v4 drained)" >> $QLOG

# --- H. MAPPO warm-started from the r5scale medium clone (item 8) -----------
if [ ! -f $RD/mappo_medium_warmstart.json ]; then
  CKH=runs/dagger_medium_r5scale/ckpt_best
  [ -d "$CKH" ] && [ -n "$(ls -A $CKH 2>/dev/null)" ] || CKH=runs/dagger_medium_r5scale/ckpt
  if [ -n "$(ls -A $CKH 2>/dev/null)" ]; then
    stage H_mappo 2400 python3 experiments/medium_mappo.py --env "$MEDIUM" \
      --net gnn --hidden_dim 64 --num_envs 8 --num_strides 100 \
      --init_from "$CKH" --eval_every 20 --eval_episodes 8 --tag warmstart
  else
    stage H_mappo 2400 python3 experiments/medium_mappo.py --env "$MEDIUM" \
      --net gnn --hidden_dim 64 --num_envs 8 --num_strides 100 \
      --eval_every 20 --eval_episodes 8 --tag warmstart
  fi
  cp -f runs/mappo_medium_warmstart/result.json \
    $RD/mappo_medium_warmstart.json 2>/dev/null
  harvest
fi

# --- L. medium baselines restore (item 9: missing multistep rows) -----------
if [ ! -f $RD/sizes/baselines_medium__multistep.json ]; then
  stage L_baselines_medium 2400 python3 experiments/medium_baselines_table.py \
    --env "$MEDIUM" --models gru lstm pos_gru pos_lstm --epochs 30 \
    --save_params --out_dir /root/repo/runs/baselines_medium
  stage L2_baselines_medium_ms 900 python3 experiments/baselines_multistep.py \
    --params_dir /root/repo/runs/baselines_medium --env "$MEDIUM"
  harvest
fi

# --- K. medium h=1 GDE restore (item 9: specialist multistep column) --------
# Truncation-tolerant: checkpoint_every 5 + best-val resume means even a
# deadline-cut run yields an evaluable checkpoint; the multistep json
# records the epoch count it reached.
if [ ! -f $RD/sizes/gde_medium_ref__multistep.json ]; then
  stage K_gde_h1 3300 python3 experiments/medium_gde_ref_scale.py \
    --env "$MEDIUM" --epochs 100 --horizon 1 --checkpoint_every 5 \
    --scan_chunk 2000 --out_dir /root/repo/runs/gde_medium_ref
  stage K2_gde_h1_ms 1200 python3 experiments/gde_multistep.py \
    --env "$MEDIUM" --run_dir /root/repo/runs/gde_medium_ref
  harvest
fi

# --- Z. final bench (compile cache warm; Z0 post-reset took 58 s) -----------
HARD_DEADLINE=$(( $(date +%s) + 900 ))
stage Zv5_bench 800 python3 bench.py
harvest
echo "=== $(date -u +%H:%M:%S) r5 queue v5 done" >> $QLOG
