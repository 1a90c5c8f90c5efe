#!/bin/bash
# Round-5 queue v3 — post-VM-reset restart of r5_queue_v2.sh.
# The reset wiped datasets/ and runs/ (and all v2 runner pids), so v3
# regenerates datasets first and re-orders for the time left in the
# round (hard deadline 2026-08-20 01:15 UTC, final bench after):
#   bench early -> medium datagen -> r5scale DAgger medium (unblocks the
#   CPU honest-T eval ASAP) -> medium baselines + h=1 GDE (the two
#   missing multistep-table rows, VERDICT top ask) -> large datagen ->
#   r5scale DAgger large -> comm-QMIX curve (streamed jsonl, partial OK)
#   -> MAPPO -> per-size baselines/GDE rows -> extralarge mini-leg.
# Stages already satisfied by committed artifacts are gated out.
# Large-QMIX continuation (v2 stage M) is NOT here: its ep-22.5k curve
# landed in results_data/qmix_large_coordtrain_resume.jsonl before the
# reset and the checkpoint is gone; the curve is written up instead.
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
LARGE=tarware-large-15agvs-8pickers-partialobs-v1
TINY=tarware-tiny-3agvs-2pickers-partialobs-v1
SMALL=tarware-small-6agvs-3pickers-partialobs-v1
MED10=tarware-medium-10agvs-5pickers-partialobs-v1
XL=tarware-extralarge-19agvs-9pickers-partialobs-v1
QLOG=/tmp/r5_queue.log
RD=results_data
HARD_DEADLINE=$(date -ud "2026-08-20 01:15" +%s)

stage() {  # stage <name> <cap_seconds> <cmd...>
  local name=$1 cap=$2; shift 2
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  [ "$budget" -gt "$cap" ] && budget=$cap
  if [ -f /tmp/r5_queue_stop ] || [ "$budget" -le 60 ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop/deadline)" >> $QLOG
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name (budget ${budget}s): $*" >> $QLOG
  timeout -s TERM "$budget" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> $QLOG
}

harvest() {
  python3 scripts/harvest_results.py >> $QLOG 2>&1
  git add results_data 2>/dev/null
  git commit -q -m "r5 queue: harvest stage artifacts" 2>/dev/null || true
}

echo "=== $(date -u +%H:%M:%S) r5 queue v3 start" >> $QLOG

# --- Z0: headline bench with the flipped rejoin default --------------------
if ! grep -q batched_env_steps /tmp/r5_Z0_bench.log 2>/dev/null; then
  stage Z0_bench 1200 python3 bench.py
fi

# --- A. medium dataset (reset wiped datasets/) ------------------------------
ls datasets/warehouse_data_${MEDIUM}_seed*.h5 >/dev/null 2>&1 || \
  stage A_datagen_med 2700 python3 scripts/collect_data.py \
    --env_ids "$MEDIUM" --seeds 0 1000 2000 3000 4000 \
    --num_episodes 200 --batch 40 --out_dir datasets

# --- G5. full 4-round DAgger medium with the scan-fast BC (item 6) ----------
if [ ! -f $RD/dagger_medium_r5scale.json ]; then
  stage G5_dagger_medium_r5 3900 python3 experiments/medium_dagger.py \
    --env "$MEDIUM" --net gnn --hidden_dim 64 --rounds 4 \
    --episodes_per_round 48 --epochs0 10 --epochs_per_round 4 --stride 3 \
    --max_episodes 400 --collect_temperature 2.0 --eval_episodes 8 \
    --tag r5scale
  CK5=runs/dagger_medium_r5scale/ckpt_best
  [ -d "$CK5" ] || CK5=runs/dagger_medium_r5scale/ckpt
  stage G5b_export_clone_r5 900 python3 experiments/export_policy.py --cpu \
    --ckpt "$CK5" --kind bc --env_id "$MEDIUM" --net gnn --hidden_dim 64 \
    --coordinated --temperature 3.0 \
    --out $RD/policy_dagger_clone_r5.stablehlo
  cp -f runs/dagger_medium_r5scale/result.json \
    $RD/dagger_medium_r5scale.json 2>/dev/null
  harvest
fi

# --- L. medium baselines restore (item 9: missing multistep row) ------------
if [ ! -f $RD/sizes/baselines_medium__multistep.json ]; then
  stage L_baselines_medium 2400 python3 experiments/medium_baselines_table.py \
    --env "$MEDIUM" --models gru lstm pos_gru pos_lstm --epochs 30 \
    --save_params --out_dir /root/repo/runs/baselines_medium
  stage L2_baselines_medium_ms 900 python3 experiments/baselines_multistep.py \
    --params_dir /root/repo/runs/baselines_medium --env "$MEDIUM"
  harvest
fi

# --- K. medium h=1 GDE (items 3+9: flagship hypothesis reference point) -----
if [ ! -f $RD/sizes/gde_medium_ref__multistep.json ]; then
  stage K_gde_h1 3300 python3 experiments/medium_gde_ref_scale.py \
    --env "$MEDIUM" --epochs 100 --horizon 1 --checkpoint_every 5 \
    --scan_chunk 2000 --out_dir /root/repo/runs/gde_medium_ref
  stage K2_gde_h1_ms 1200 python3 experiments/gde_multistep.py \
    --env "$MEDIUM" --run_dir /root/repo/runs/gde_medium_ref
  harvest
fi

# --- A2. large dataset -------------------------------------------------------
ls datasets/warehouse_data_${LARGE}_seed*.h5 >/dev/null 2>&1 || \
  stage A2_datagen_large 2100 python3 scripts/collect_data.py \
    --env_ids "$LARGE" --seeds 0 1000 2000 3000 4000 \
    --num_episodes 200 --batch 40 --out_dir datasets

# --- G6. full 4-round DAgger large (item 6) ----------------------------------
if [ ! -f $RD/dagger_large_r5scale.json ]; then
  stage G6_dagger_large_r5 3900 python3 experiments/medium_dagger.py \
    --env "$LARGE" --net gnn --hidden_dim 64 --rounds 4 \
    --episodes_per_round 48 --epochs0 10 --epochs_per_round 4 --stride 3 \
    --max_episodes 400 --collect_temperature 2.0 --eval_episodes 8 \
    --tag r5scale
  CK6=runs/dagger_large_r5scale/ckpt_best
  [ -d "$CK6" ] || CK6=runs/dagger_large_r5scale/ckpt
  stage G6b_export_clone_large_r5 900 python3 experiments/export_policy.py \
    --cpu --ckpt "$CK6" --kind bc --env_id "$LARGE" --net gnn \
    --hidden_dim 64 --coordinated --temperature 3.0 \
    --out $RD/policy_dagger_clone_large_r5.stablehlo
  cp -f runs/dagger_large_r5scale/result.json \
    $RD/dagger_large_r5scale.json 2>/dev/null
  harvest
fi

# --- I. CommRound real curve (item 4; jsonl streams, partial curve OK) -------
if [ ! -f $RD/qmix_medium_comm_5k.jsonl ]; then
  stage I_qmix_comm 2700 python3 experiments/medium_qmix_5k.py \
    --env_id "$MEDIUM" --num_episodes 5000 --coordinated --net gnode_comm \
    --eval_every 250 --eval_episodes 8 --tag comm
  cp -f runs/qmix_medium_5k_comm/qmix_medium_5k.jsonl \
    $RD/qmix_medium_comm_5k.jsonl 2>/dev/null
  harvest
fi

# --- H. MAPPO warm-started from the r5scale clone (item 8) -------------------
if [ ! -f $RD/mappo_medium_warmstart.json ]; then
  CKH=runs/dagger_medium_r5scale/ckpt_best
  [ -d "$CKH" ] || CKH=runs/dagger_medium_r5scale/ckpt
  stage H_mappo 2400 python3 experiments/medium_mappo.py --env "$MEDIUM" \
    --net gnn --hidden_dim 64 --num_envs 8 --num_strides 150 \
    --init_from "$CKH" --eval_every 25 --eval_episodes 8 --tag warmstart
  cp -f runs/mappo_medium_warmstart/result.json \
    $RD/mappo_medium_warmstart.json 2>/dev/null
  harvest
fi

# --- A3. remaining small-size datasets ---------------------------------------
ls datasets/warehouse_data_${TINY}_seed*.h5 >/dev/null 2>&1 || \
  stage A3_datagen_rest 1800 python3 scripts/collect_data.py \
    --env_ids "$TINY" "$SMALL" "$MED10" --seeds 0 1000 2000 3000 4000 \
    --num_episodes 200 --batch 40 --out_dir datasets

# --- D/F. baselines rows: large + tiny/small/medium10 (item 9) ---------------
if [ ! -f $RD/sizes/baselines_large__multistep.json ]; then
  stage D_baselines_large 1500 python3 experiments/medium_baselines_table.py \
    --env "$LARGE" --models pos_gru pos_lstm --epochs 10 --save_params \
    --out_dir /root/repo/runs/baselines_large
  stage D2_baselines_large_ms 900 python3 experiments/baselines_multistep.py \
    --params_dir /root/repo/runs/baselines_large --env "$LARGE"
  harvest
fi
for size in tiny:$TINY small:$SMALL medium10:$MED10; do
  s=${size%%:*}; e=${size#*:}
  if [ ! -f $RD/sizes/baselines_${s}__multistep.json ]; then
    stage F_baselines_$s 1200 python3 experiments/medium_baselines_table.py \
      --env "$e" --models gru lstm pos_gru pos_lstm --epochs 10 \
      --save_params --out_dir "/root/repo/runs/baselines_$s"
    stage F_baselines_${s}_ms 600 python3 experiments/baselines_multistep.py \
      --params_dir "/root/repo/runs/baselines_$s" --env "$e"
    harvest
  fi
done

# --- X. extralarge mini end-to-end leg (item 7) ------------------------------
if [ ! -f $RD/sizes/gde_extralarge_ref_h4__multistep.json ]; then
  ls datasets/warehouse_data_${XL}_seed*.h5 >/dev/null 2>&1 || \
    stage XA_datagen_xl 1800 python3 scripts/collect_data.py \
      --env_ids "$XL" --seeds 0 1000 2000 \
      --num_episodes 120 --batch 40 --out_dir datasets
  stage XB_gde_xl_h4 2400 python3 experiments/medium_gde_ref_scale.py \
    --env "$XL" --epochs 12 --horizon 4 --checkpoint_every 2 \
    --scan_chunk 1000 --device_shard_episodes 250 \
    --out_dir /root/repo/runs/gde_extralarge_ref_h4
  stage XB2_gde_xl_ms 1200 python3 experiments/gde_multistep.py \
    --env "$XL" --run_dir /root/repo/runs/gde_extralarge_ref_h4
  harvest
fi
if [ ! -f $RD/qmix_xl.jsonl ]; then
  stage XC_qmix_xl 1500 python3 experiments/medium_qmix_5k.py \
    --env_id "$XL" --num_episodes 800 --coordinated \
    --eval_every 200 --eval_episodes 8 --tag xl
  cp -f runs/qmix_medium_5k_xl/qmix_medium_5k.jsonl \
    $RD/qmix_xl.jsonl 2>/dev/null
  harvest
fi

# --- XF. per-size GDE h4 rows (item 9) ---------------------------------------
for size in tiny:$TINY small:$SMALL medium10:$MED10; do
  s=${size%%:*}; e=${size#*:}
  if [ ! -f $RD/sizes/gde_${s}_ref_h4__multistep.json ]; then
    stage XF_gde_$s 1800 python3 experiments/medium_gde_ref_scale.py \
      --env "$e" --epochs 30 --horizon 4 --checkpoint_every 5 \
      --scan_chunk 2000 --out_dir "/root/repo/runs/gde_${s}_ref_h4"
    stage XF_gde_${s}_ms 900 python3 experiments/gde_multistep.py \
      --env "$e" --run_dir "/root/repo/runs/gde_${s}_ref_h4"
    harvest
  fi
done

# --- Z. final bench -----------------------------------------------------------
rm -f /tmp/r5_queue_stop
HARD_DEADLINE=$(( $(date +%s) + 1200 ))
stage Z_bench 1100 python3 bench.py
harvest
echo "=== $(date -u +%H:%M:%S) r5 queue v3 done" >> $QLOG
