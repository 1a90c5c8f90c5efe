#!/bin/bash
# Round-5 queue v7 — final manual runbook (session takeover at 00:45).
# Context: v5 was found still alive re-running v4's L stage (stale pidfile);
# both duplicates were stopped/consolidated and v6 was stop-filed before it
# started any stage. This queue owns the chip after the adopted L run
# (pid $1) drains, and runs the remaining VERDICT items in priority order:
#   L2  baselines multistep row            (item 9)
#   G5  DAgger medium retry, fixed BC      (item 6 prerequisite)
#   HT5 honest-T adjudication, r5 clone    (item 6 — the round's top ask)
#   G5b clone blob export                  (item 6 artifact)
#   H2  MAPPO truly warm-started           (item 8 — the v5 run was cold:
#                                           the clone ckpt did not exist yet)
#   K   GDE h=1 restore + multistep        (item 9 specialist column)
#   X   extralarge mini leg                (item 7: datagen+GDE+ms+QMIX)
#   XT  tiny GDE row from committed fixtures (item 9, cheap)
#   Z   final bench
# Commits after every block. Stop with: touch /tmp/r5_queue_v7_stop
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
TINY=tarware-tiny-3agvs-2pickers-partialobs-v1
XL=tarware-extralarge-19agvs-9pickers-partialobs-v1
QLOG=/tmp/r5_queue.log
RD=results_data
HARD_DEADLINE=$(date -ud "2026-08-20 04:10" +%s)

stage() {  # stage <name> <cap_seconds> <cmd...>
  local name=$1 cap=$2; shift 2
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  [ "$budget" -gt "$cap" ] && budget=$cap
  if [ -f /tmp/r5_queue_v7_stop ] || [ "$budget" -le 120 ]; then
    echo "=== $(date -u +%H:%M:%S) v7 stage $name SKIPPED (stop/deadline)" >> $QLOG
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) v7 stage $name (budget ${budget}s): $*" >> $QLOG
  timeout -s TERM "$budget" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) v7 stage $name exit $?" >> $QLOG
}

harvest() {
  python3 scripts/harvest_results.py >> $QLOG 2>&1
  git add results_data 2>/dev/null
  git commit -q -m "r5 queue: harvest stage artifacts" 2>/dev/null || true
}

# --- gate: wait for the adopted L_baselines run to drain ---------------------
L_PID=$1
while [ -n "$L_PID" ] && kill -0 "$L_PID" 2>/dev/null; do sleep 15; done
echo "=== $(date -u +%H:%M:%S) r5 queue v7 start (L drained)" >> $QLOG

# --- L2. baselines multistep row (item 9) ------------------------------------
if [ ! -f $RD/sizes/baselines_medium__multistep.json ] && \
   [ -n "$(ls -A /root/repo/runs/baselines_medium 2>/dev/null)" ]; then
  stage L2_baselines_medium_ms 900 python3 experiments/baselines_multistep.py \
    --params_dir /root/repo/runs/baselines_medium --env "$MEDIUM"
  harvest
fi

# --- G5. DAgger medium retry with the fixed BC (item 6) ----------------------
CK5=runs/dagger_medium_r5scale/ckpt_best
if [ ! -f $RD/dagger_medium_r5scale.json ]; then
  stage G5_dagger_medium_r5 2700 python3 experiments/medium_dagger.py \
    --env "$MEDIUM" --net gnn --hidden_dim 64 --rounds 4 \
    --episodes_per_round 48 --epochs0 10 --epochs_per_round 4 --stride 3 \
    --max_episodes 400 --collect_temperature 2.0 --eval_episodes 8 \
    --tag r5scale
  cp -f runs/dagger_medium_r5scale/result.json \
    $RD/dagger_medium_r5scale.json 2>/dev/null
  harvest
fi
[ -d "$CK5" ] && [ -n "$(ls -A $CK5 2>/dev/null)" ] || CK5=runs/dagger_medium_r5scale/ckpt

# --- HT5. honest-T paired eval on the r5 clone (item 6) ----------------------
if [ ! -f $RD/honest_t_medium_r5.json ] && [ -n "$(ls -A $CK5 2>/dev/null)" ]; then
  stage HT5_honest_medium 2100 python3 experiments/honest_t_eval.py \
    --env "$MEDIUM" --ckpt "$CK5" --net gnn --hidden_dim 64 \
    --temps 1.5 2.0 2.5 3.0 4.0 \
    --select_seeds 8 --select_seed_base 100 \
    --eval_seeds 24 --eval_seed_base 700 \
    --out $RD/honest_t_medium_r5.json
  git add results_data && git commit -q -m \
    "honest-T paired eval: medium r5scale DAgger clone" 2>/dev/null || true
fi

# --- G5b. export the clone blob (cheap) ---------------------------------------
if [ ! -f $RD/policy_dagger_clone_r5.stablehlo ] && \
   [ -n "$(ls -A $CK5 2>/dev/null)" ]; then
  stage G5b_export_clone_r5 700 python3 experiments/export_policy.py --cpu \
    --ckpt "$CK5" --kind bc --env_id "$MEDIUM" --net gnn --hidden_dim 64 \
    --coordinated --temperature 3.0 \
    --out $RD/policy_dagger_clone_r5.stablehlo
  harvest
fi

# --- H2. MAPPO truly warm-started from the r5 clone (item 8) -----------------
if [ ! -f $RD/mappo_medium_warmstart2.json ] && [ -n "$(ls -A $CK5 2>/dev/null)" ]; then
  stage H2_mappo_warm 1900 python3 experiments/medium_mappo.py --env "$MEDIUM" \
    --net gnn --hidden_dim 64 --num_envs 8 --num_strides 100 \
    --init_from "$CK5" --eval_every 20 --eval_episodes 8 --tag warmstart2
  cp -f runs/mappo_medium_warmstart2/result.json \
    $RD/mappo_medium_warmstart2.json 2>/dev/null
  harvest
fi

# --- K. medium h=1 GDE restore + multistep (item 9) ---------------------------
if [ ! -f $RD/sizes/gde_medium_ref__multistep.json ]; then
  stage K_gde_h1 2400 python3 experiments/medium_gde_ref_scale.py \
    --env "$MEDIUM" --epochs 60 --horizon 1 --checkpoint_every 5 \
    --scan_chunk 2000 --out_dir /root/repo/runs/gde_medium_ref
  stage K2_gde_h1_ms 1000 python3 experiments/gde_multistep.py \
    --env "$MEDIUM" --run_dir /root/repo/runs/gde_medium_ref
  harvest
fi

# --- X. extralarge mini end-to-end leg (item 7) -------------------------------
if [ ! -f $RD/sizes/gde_extralarge_ref_h4__multistep.json ]; then
  ls datasets/warehouse_data_${XL}_seed*.h5 >/dev/null 2>&1 || \
    stage XA_datagen_xl 1800 python3 scripts/collect_data.py \
      --env_ids "$XL" --seeds 0 4000 --num_episodes 60 --batch 30 \
      --out_dir datasets
  # seed 4000 included deliberately: gde_multistep.py evaluates on the
  # seed4000 file (held-out-ish slice, same convention as medium).
  stage XB_gde_xl_h4 2100 python3 experiments/medium_gde_ref_scale.py \
    --env "$XL" --epochs 12 --horizon 4 --checkpoint_every 2 \
    --scan_chunk 1000 --device_shard_episodes 250 \
    --out_dir /root/repo/runs/gde_extralarge_ref_h4
  stage XB2_gde_xl_ms 1200 python3 experiments/gde_multistep.py \
    --env "$XL" --run_dir /root/repo/runs/gde_extralarge_ref_h4
  harvest
fi
if [ ! -f $RD/qmix_xl.jsonl ] && \
   ls datasets/warehouse_data_${XL}_seed*.h5 >/dev/null 2>&1; then
  stage XC_qmix_xl 1400 python3 experiments/medium_qmix_5k.py \
    --env_id "$XL" --num_episodes 800 --coordinated \
    --eval_every 200 --eval_episodes 8 --tag xl
  cp -f runs/qmix_medium_5k_xl/qmix_medium_5k.jsonl \
    $RD/qmix_xl.jsonl 2>/dev/null
  harvest
fi

# --- XT. tiny GDE row from the committed fixture datasets (item 9) -----------
if [ ! -f $RD/sizes/gde_tiny_ref_h4__multistep.json ]; then
  stage XT_gde_tiny 1200 python3 experiments/medium_gde_ref_scale.py \
    --env "$TINY" --data_dir /root/repo/tests/fixtures/datasets \
    --epochs 30 --horizon 4 --checkpoint_every 5 --scan_chunk 2000 \
    --out_dir /root/repo/runs/gde_tiny_ref_h4
  stage XT_gde_tiny_ms 700 python3 experiments/gde_multistep.py \
    --env "$TINY" --data_dir /root/repo/tests/fixtures/datasets \
    --run_dir /root/repo/runs/gde_tiny_ref_h4
  harvest
fi

# --- Z. final bench ------------------------------------------------------------
HARD_DEADLINE=$(( $(date +%s) + 900 ))
stage Zv7_bench 800 python3 bench.py
harvest
echo "=== $(date -u +%H:%M:%S) r5 queue v7 done" >> $QLOG
