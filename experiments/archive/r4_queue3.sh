#!/bin/bash
# Round-4 third chip queue: restore the wiped medium evidence chain and
# finish the flagship to the clean reference recipe (VERDICT items 1+3).
# The primary queue trains the h4w flagship to 120 epochs; item 3 asks for
# the clean 200-epoch recipe, and the medium multistep table needs the h=1
# GDE and medium baselines that died with runs/ (r3 trained them at 200/30
# epochs — RESULTS.md "Reference-scale GDE training"). Waits for queue2.
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
HARD_DEADLINE=$(date -ud "2026-08-20 12:00" +%s)
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
QLOG=/tmp/r4_queue3.log
RD=results_data

stage() {  # stage <name> <cap_seconds> <cmd...>
  local name=$1 cap=$2; shift 2
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  [ "$budget" -gt "$cap" ] && budget=$cap
  if [ -f /tmp/r4_queue3_stop ] || [ "$budget" -le 60 ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop/deadline)" >> $QLOG
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name (budget ${budget}s): $*" >> $QLOG
  timeout -s TERM "$budget" "$@" > "/tmp/r4c_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> $QLOG
}

harvest() {
  python3 scripts/harvest_results.py >> $QLOG 2>&1
  git add results_data 2>/dev/null
  git commit -q -m "r4 queue: harvest stage artifacts" 2>/dev/null || true
}

# --- gate: wait for queue2 to drain --------------------------------------
QPID=$(cat /tmp/r4_queue2.pid 2>/dev/null)
while [ -n "$QPID" ] && kill -0 "$QPID" 2>/dev/null; do sleep 60; done
echo "=== $(date -u +%H:%M:%S) r4 queue3 start (queue2 drained)" >> $QLOG

# --- J. flagship h4w to the clean 200-epoch recipe (item 3) ---------------
# Auto-resumes from the primary queue's epoch-120 checkpoint.
stage J_gde_h4w_200 7200 python3 experiments/medium_gde_ref_scale.py \
  --env "$MEDIUM" --epochs 200 --horizon 4 --horizon_weights 3 1 1 1 \
  --tag h4w --checkpoint_every 2 --scan_chunk 2000
stage J2_gde_h4w_ms 1200 python3 experiments/gde_multistep.py \
  --env "$MEDIUM" --run_dir /root/repo/runs/gde_medium_ref_h4w
stage J3_export_gde_h4w 900 python3 experiments/export_gde.py --cpu \
  --ckpt runs/gde_medium_ref_h4w/ckpt --env "$MEDIUM" \
  --horizon 4 --out $RD/gde_medium_h4w.stablehlo
harvest

# --- K. restore the medium h=1 GDE (the t=+1 reference point) -------------
if [ ! -f $RD/sizes/gde_medium_ref__multistep.json ]; then
  stage K_gde_h1_200 6000 python3 experiments/medium_gde_ref_scale.py \
    --env "$MEDIUM" --epochs 200 --horizon 1 --checkpoint_every 5 \
    --scan_chunk 2000 --out_dir /root/repo/runs/gde_medium_ref
  stage K2_gde_h1_ms 1200 python3 experiments/gde_multistep.py \
    --env "$MEDIUM" --run_dir /root/repo/runs/gde_medium_ref
  harvest
fi

# --- L. restore the medium baselines rows ---------------------------------
if [ ! -f $RD/sizes/baselines_medium__multistep.json ]; then
  stage L_baselines_medium 2400 python3 experiments/medium_baselines_table.py \
    --env "$MEDIUM" --models gru lstm pos_gru pos_lstm --epochs 30 \
    --save_params --out_dir /root/repo/runs/baselines_medium
  stage L2_baselines_medium_ms 900 python3 experiments/baselines_multistep.py \
    --params_dir /root/repo/runs/baselines_medium --env "$MEDIUM"
  harvest
fi

# --- Z''. fresh bench ------------------------------------------------------
rm -f /tmp/r4_queue3_stop
HARD_DEADLINE=$(( $(date +%s) + 1500 ))
stage Z_bench 1400 python3 bench.py
echo "=== $(date -u +%H:%M:%S) r4 queue3 done" >> $QLOG

# --- appended while queue3 waited at its gate (append-only is safe for a
# --- running bash script; inserting lines is not) ------------------------
HARD_DEADLINE=$(date -ud "2026-08-20 12:00" +%s)
LARGE=tarware-large-15agvs-8pickers-partialobs-v1

# --- M. large coordtrain QMIX to its plateau (item 4 asks 25-30k; the
# --- primary queue's C stage only reaches 12k) ----------------------------
stage M_qmix_large_26k 9000 python3 experiments/medium_qmix_5k.py \
  --env_id "$LARGE" --num_episodes 26000 --coordinated \
  --eval_every 250 --eval_episodes 8 --tag coordtrain_large \
  --resume_from runs/qmix_medium_5k_coordtrain_large/ckpt
stage M2_export_qmix_large 900 python3 experiments/export_policy.py --cpu \
  --ckpt runs/qmix_medium_5k_coordtrain_large/ckpt --kind qmix \
  --env_id "$LARGE" --net gnode --hidden_dim 64 --coordinated \
  --out $RD/policy_qmix_large_coordtrain.stablehlo
cp -f runs/qmix_medium_5k_coordtrain_large/qmix_medium_5k.jsonl \
  $RD/qmix_large_coordtrain_resume.jsonl 2>/dev/null
harvest

# --- N. rejoin operating point: pick from the sweep + chip parity ---------
if [ ! -f $RD/parity_rejoin_r4.json ]; then
  stage N_rejoin_choice 3300 python3 scripts/validate_rejoin_choice.py
  harvest
fi

# --- Z'''. rebench after the appended stages -------------------------------
HARD_DEADLINE=$(( $(date +%s) + 1500 ))
stage Z2_bench 1400 python3 bench.py
echo "=== $(date -u +%H:%M:%S) r4 queue3 appended stages done" >> $QLOG
