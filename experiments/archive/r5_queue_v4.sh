#!/bin/bash
# Round-5 queue v4 — restart of v3 after its datagen stages no-op'd
# (datasets/ did not exist post-VM-reset; collect_data.py now mkdirs it).
# Gates on v3's pid: v3 finishes the running comm-QMIX stage, skips the
# rest (stop file), re-benches, exits; v4 then owns the chip.
#
# Change vs v3: honest-T paired evals run ON THE CHIP right after each
# DAgger stage (the eval is a jitted whole-episode lax.scan — minutes on
# chip vs ~2 h on this single-core host), replacing the CPU queue.
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

# --- gate: let v3 drain (it finishes comm-QMIX, skips the rest, benches) ----
V3=$(cat /tmp/r5_queue_v3.pid 2>/dev/null)
while [ -n "$V3" ] && kill -0 "$V3" 2>/dev/null; do sleep 20; done
rm -f /tmp/r5_queue_stop
echo "=== $(date -u +%H:%M:%S) r5 queue v4 start (v3 drained)" >> $QLOG

# --- A. medium dataset -------------------------------------------------------
ls datasets/warehouse_data_${MEDIUM}_seed*.h5 >/dev/null 2>&1 || \
  stage A_datagen_med 2700 python3 scripts/collect_data.py \
    --env_ids "$MEDIUM" --seeds 0 1000 2000 3000 4000 \
    --num_episodes 200 --batch 40 --out_dir datasets

# --- G5. full 4-round DAgger medium with the scan-fast BC (item 6) ----------
if [ ! -f $RD/dagger_medium_r5scale.json ]; then
  stage G5_dagger_medium_r5 3600 python3 experiments/medium_dagger.py \
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

# --- HT5. honest-T paired eval of the medium clone, ON CHIP (item 6) --------
if [ ! -f $RD/honest_t_medium_r5.json ] && \
   [ -f $RD/dagger_medium_r5scale.json ]; then
  CK=runs/dagger_medium_r5scale/ckpt_best
  [ -d "$CK" ] || CK=runs/dagger_medium_r5scale/ckpt
  stage HT5_honest_medium 2400 python3 experiments/honest_t_eval.py \
    --env "$MEDIUM" --ckpt "$CK" --net gnn --hidden_dim 64 \
    --temps 1.5 2.0 2.5 3.0 4.0 \
    --select_seeds 8 --select_seed_base 100 \
    --eval_seeds 24 --eval_seed_base 700 \
    --out $RD/honest_t_medium_r5.json
  git add results_data && git commit -q -m \
    "honest-T paired eval: medium r5scale DAgger clone" 2>/dev/null || true
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
  stage G6_dagger_large_r5 3600 python3 experiments/medium_dagger.py \
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

# --- HT6. honest-T paired eval of the large clone, ON CHIP (item 6) ---------
if [ ! -f $RD/honest_t_large_r5.json ] && \
   [ -f $RD/dagger_large_r5scale.json ]; then
  CK=runs/dagger_large_r5scale/ckpt_best
  [ -d "$CK" ] || CK=runs/dagger_large_r5scale/ckpt
  stage HT6_honest_large 2100 python3 experiments/honest_t_eval.py \
    --env "$LARGE" --ckpt "$CK" --net gnn --hidden_dim 64 \
    --temps 1.5 2.0 2.5 3.0 4.0 \
    --select_seeds 8 --select_seed_base 100 \
    --eval_seeds 16 --eval_seed_base 700 \
    --out $RD/honest_t_large_r5.json
  git add results_data && git commit -q -m \
    "honest-T paired eval: large r5scale DAgger clone" 2>/dev/null || true
fi

# --- H. MAPPO warm-started from the r5scale clone (item 8) -------------------
if [ ! -f $RD/mappo_medium_warmstart.json ]; then
  CKH=runs/dagger_medium_r5scale/ckpt_best
  [ -d "$CKH" ] || CKH=runs/dagger_medium_r5scale/ckpt
  stage H_mappo 2400 python3 experiments/medium_mappo.py --env "$MEDIUM" \
    --net gnn --hidden_dim 64 --num_envs 8 --num_strides 100 \
    --init_from "$CKH" --eval_every 20 --eval_episodes 8 --tag warmstart
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
echo "=== $(date -u +%H:%M:%S) r5 queue v4 done" >> $QLOG
