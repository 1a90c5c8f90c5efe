#!/bin/bash
# Round-5 queue v6 — manual-takeover chain for the final hours.
# Context: v4's G5 DAgger crashed on the BC epoch-scan HTTP 413 (fixed in
# train_bc.py: dataset tensors are now jit arguments, not closures), which
# cascaded into HT5 being gate-skipped; v4/v5 were killed and the running
# L_baselines stage adopted. This chain waits for L, then runs the
# remaining stages in VERDICT priority order with artifact-tolerant gates:
#   L2 (baselines multistep row) -> G5 retry (DAgger medium, fixed BC)
#   -> HT5 (honest-T medium, gated on the CHECKPOINT existing, not
#   result.json, so a deadline-cut DAgger still gets adjudicated)
#   -> H (MAPPO warm-start) -> K (GDE h=1 restore, only if time)
#   -> final bench. Commits after every block.
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
QLOG=/tmp/r5_queue.log
RD=results_data
HARD_DEADLINE=$(date -ud "2026-08-20 03:00" +%s)

stage() {  # stage <name> <cap_seconds> <cmd...>
  local name=$1 cap=$2; shift 2
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  [ "$budget" -gt "$cap" ] && budget=$cap
  if [ -f /tmp/r5_queue_v6_stop ] || [ "$budget" -le 120 ]; then
    echo "=== $(date -u +%H:%M:%S) v6 stage $name SKIPPED (stop/deadline)" >> $QLOG
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) v6 stage $name (budget ${budget}s): $*" >> $QLOG
  timeout -s TERM "$budget" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) v6 stage $name exit $?" >> $QLOG
}

harvest() {
  python3 scripts/harvest_results.py >> $QLOG 2>&1
  git add results_data 2>/dev/null
  git commit -q -m "r5 queue: harvest stage artifacts" 2>/dev/null || true
}

# --- gate: wait for the adopted L_baselines child (pid arg $1) --------------
L_PID=$1
while [ -n "$L_PID" ] && kill -0 "$L_PID" 2>/dev/null; do sleep 20; done
echo "=== $(date -u +%H:%M:%S) r5 queue v6 start (L drained)" >> $QLOG

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
  stage G5_dagger_medium_r5 3000 python3 experiments/medium_dagger.py \
    --env "$MEDIUM" --net gnn --hidden_dim 64 --rounds 4 \
    --episodes_per_round 48 --epochs0 10 --epochs_per_round 4 --stride 3 \
    --max_episodes 400 --collect_temperature 2.0 --eval_episodes 8 \
    --tag r5scale
  cp -f runs/dagger_medium_r5scale/result.json \
    $RD/dagger_medium_r5scale.json 2>/dev/null
  harvest
fi
[ -d "$CK5" ] && [ -n "$(ls -A $CK5 2>/dev/null)" ] || CK5=runs/dagger_medium_r5scale/ckpt

# --- HT5. honest-T paired eval, gated on the CHECKPOINT (item 6) ------------
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

# --- G5b. export the clone blob (CPU, cheap) ---------------------------------
if [ ! -f $RD/policy_dagger_clone_r5.stablehlo ] && \
   [ -n "$(ls -A $CK5 2>/dev/null)" ]; then
  stage G5b_export_clone_r5 900 python3 experiments/export_policy.py --cpu \
    --ckpt "$CK5" --kind bc --env_id "$MEDIUM" --net gnn --hidden_dim 64 \
    --coordinated --temperature 3.0 \
    --out $RD/policy_dagger_clone_r5.stablehlo
  harvest
fi

# --- H. MAPPO warm-started from the clone (item 8) ---------------------------
if [ ! -f $RD/mappo_medium_warmstart.json ]; then
  if [ -n "$(ls -A $CK5 2>/dev/null)" ]; then
    stage H_mappo 2100 python3 experiments/medium_mappo.py --env "$MEDIUM" \
      --net gnn --hidden_dim 64 --num_envs 8 --num_strides 100 \
      --init_from "$CK5" --eval_every 20 --eval_episodes 8 --tag warmstart
  else
    stage H_mappo 2100 python3 experiments/medium_mappo.py --env "$MEDIUM" \
      --net gnn --hidden_dim 64 --num_envs 8 --num_strides 100 \
      --eval_every 20 --eval_episodes 8 --tag warmstart
  fi
  cp -f runs/mappo_medium_warmstart/result.json \
    $RD/mappo_medium_warmstart.json 2>/dev/null
  harvest
fi

# --- K. medium h=1 GDE restore (item 9) — only with >=45 min left ------------
if [ ! -f $RD/sizes/gde_medium_ref__multistep.json ] && \
   [ $((HARD_DEADLINE - $(date +%s))) -gt 2700 ]; then
  stage K_gde_h1 2400 python3 experiments/medium_gde_ref_scale.py \
    --env "$MEDIUM" --epochs 60 --horizon 1 --checkpoint_every 5 \
    --scan_chunk 2000 --out_dir /root/repo/runs/gde_medium_ref
  stage K2_gde_h1_ms 1200 python3 experiments/gde_multistep.py \
    --env "$MEDIUM" --run_dir /root/repo/runs/gde_medium_ref
  harvest
fi

# --- Z. final bench -----------------------------------------------------------
HARD_DEADLINE=$(( $(date +%s) + 900 ))
stage Zv6_bench 800 python3 bench.py
harvest
echo "=== $(date -u +%H:%M:%S) r5 queue v6 done" >> $QLOG
