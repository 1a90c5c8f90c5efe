#!/bin/bash
# Round-4 chip queue. Priorities = round-3 VERDICT items, in order:
#  B.  GDE medium h4 with horizon-weighted loss (item 3: one model that
#      wins both the 1-step and rollout regimes) + multistep + blob.
#  C.  large coordtrain QMIX resume from the surviving ep-10496
#      checkpoint toward its plateau (item 4).
#  D.  the pending large pos-model rollout rows (item 2).
#  F.  4-size baselines sweep tiny/small/medium10 (item 2).
#  XF. per-size GDE h4 rows (item 2).
#  E.  GDE large h4 rebuild + blob (item 1: committed flagship blobs).
#  G.  chip-scale DAgger + clone blob (item 5; honest-T paired evals run
#      on the CPU backend outside this queue).
#  H.  MAPPO warm-started from the DAgger clone (item 6).
#  X*. extralarge leg (item 9) — lowest priority, deadline-cut first.
#  Z.  harvest metric JSONs into results_data/ + fresh bench, always.
# Every stage gets a per-stage cap AND the global deadline; artifacts are
# harvested to results_data/ (committed) after each block — three VM
# resets have taught us runs/ is ephemeral.
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
HARD_DEADLINE=$(date -ud "2026-08-19 20:05" +%s)
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
LARGE=tarware-large-15agvs-8pickers-partialobs-v1
XL=tarware-extralarge-19agvs-9pickers-partialobs-v1
QLOG=/tmp/r4_queue.log

stage() {  # stage <name> <cap_seconds> <cmd...>
  local name=$1 cap=$2; shift 2
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  [ "$budget" -gt "$cap" ] && budget=$cap
  if [ -f /tmp/r4_queue_stop ] || [ "$budget" -le 60 ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop/deadline)" >> $QLOG
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name (budget ${budget}s): $*" >> $QLOG
  timeout -s TERM "$budget" "$@" > "/tmp/r4_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> $QLOG
}

harvest() { python3 scripts/harvest_results.py >> $QLOG 2>&1; }

# --- gate: wait for the running datagen (PID in /tmp/r4_datagen.pid) ---
DGPID=$(cat /tmp/r4_datagen.pid 2>/dev/null)
while [ -n "$DGPID" ] && kill -0 "$DGPID" 2>/dev/null; do sleep 30; done
echo "=== $(date -u +%H:%M:%S) r4 queue start (datagen drained)" >> $QLOG

# --- A2. replan-rejoin throughput sweep (item 7) ------------------------
stage A2_rejoin_sweep 1500 python3 experiments/rejoin_sweep.py --steps 250
cp -f /tmp/r4_A2_rejoin_sweep.log results_data/rejoin_sweep_r4.log 2>/dev/null

# --- B. GDE medium h4, horizon-weighted (flagship; items 1+3) ----------
for a in 1 2; do
  stage B_gde_medium_h4w_a$a 6600 python3 experiments/medium_gde_ref_scale.py \
    --env "$MEDIUM" --epochs 120 --horizon 4 --horizon_weights 3 1 1 1 \
    --tag h4w --checkpoint_every 2 --scan_chunk 2000
  grep -q "best val" "/tmp/r4_B_gde_medium_h4w_a$a.log" 2>/dev/null && break
done

stage B2_gde_medium_ms 1200 python3 experiments/gde_multistep.py \
  --env "$MEDIUM" --run_dir /root/repo/runs/gde_medium_ref_h4w

stage B3_export_gde_medium 900 python3 experiments/export_gde.py --cpu \
  --ckpt runs/gde_medium_ref_h4w/ckpt --env "$MEDIUM" \
  --horizon 4 --out results_data/gde_medium_h4w.stablehlo
harvest

# --- C. large coordtrain QMIX resume toward plateau (item 4) -----------
stage C_qmix_large_resume 4200 python3 experiments/medium_qmix_5k.py \
  --env_id "$LARGE" --num_episodes 12000 --coordinated \
  --eval_every 250 --eval_episodes 8 --tag coordtrain_large \
  --resume_from runs/qmix_medium_5k_coordtrain_large/ckpt

stage C2_export_qmix_large 900 python3 experiments/export_policy.py --cpu \
  --ckpt runs/qmix_medium_5k_coordtrain_large/ckpt --kind qmix \
  --env_id "$LARGE" --net gnode --hidden_dim 64 --coordinated \
  --out results_data/policy_qmix_large_coordtrain.stablehlo
cp -f runs/qmix_medium_5k_coordtrain_large/qmix_medium_5k.jsonl \
  results_data/qmix_large_coordtrain_resume.jsonl 2>/dev/null

# --- D. pending large pos-model rollout rows (item 2) ------------------
stage D_baselines_large 1500 python3 experiments/medium_baselines_table.py \
  --env "$LARGE" --models pos_gru pos_lstm --epochs 10 --save_params
stage D2_baselines_large_ms 900 python3 experiments/baselines_multistep.py \
  --params_dir /root/repo/runs/baselines_large --env "$LARGE"
harvest

# --- F. 4-size baselines sweep (item 2) --------------------------------
F_baselines() {  # $1 short name, $2 env id
  stage F_baselines_$1 1500 python3 experiments/medium_baselines_table.py \
    --env "$2" --models gru lstm pos_gru pos_lstm --epochs 10 \
    --save_params --out_dir "/root/repo/runs/baselines_$1"
  stage F_baselines_$1_ms 900 python3 experiments/baselines_multistep.py \
    --params_dir "/root/repo/runs/baselines_$1" --env "$2"
}
F_baselines tiny tarware-tiny-3agvs-2pickers-partialobs-v1
F_baselines small tarware-small-6agvs-3pickers-partialobs-v1
F_baselines medium10 tarware-medium-10agvs-5pickers-partialobs-v1
harvest

# --- XF. per-size GDE h4 rows (item 2) ----------------------------------
XF_gde() {  # $1 short name, $2 env id
  stage XF_gde_$1 2400 python3 experiments/medium_gde_ref_scale.py \
    --env "$2" --epochs 30 --horizon 4 --checkpoint_every 5 \
    --scan_chunk 2000 --out_dir "/root/repo/runs/gde_$1_ref_h4"
  stage XF_gde_$1_ms 900 python3 experiments/gde_multistep.py \
    --env "$2" --run_dir "/root/repo/runs/gde_$1_ref_h4"
}
XF_gde tiny tarware-tiny-3agvs-2pickers-partialobs-v1
XF_gde small tarware-small-6agvs-3pickers-partialobs-v1
XF_gde medium10 tarware-medium-10agvs-5pickers-partialobs-v1
harvest

# --- E. GDE large h4 rebuild + blob (item 1) ----------------------------
for a in 1 2; do
  stage E_gde_large_h4_a$a 4500 python3 experiments/medium_gde_ref_scale.py \
    --env "$LARGE" --epochs 50 --horizon 4 --horizon_weights 3 1 1 1 \
    --tag h4w --checkpoint_every 2 --scan_chunk 1500
  grep -q "best val" "/tmp/r4_E_gde_large_h4_a$a.log" 2>/dev/null && break
done
stage E2_gde_large_ms 1200 python3 experiments/gde_multistep.py \
  --env "$LARGE" --run_dir /root/repo/runs/gde_large_ref_h4w
stage E3_export_gde_large 900 python3 experiments/export_gde.py --cpu \
  --ckpt runs/gde_large_ref_h4w/ckpt --env "$LARGE" \
  --horizon 4 --out results_data/gde_large_h4w.stablehlo
harvest

# --- G. chip-scale DAgger (item 5) --------------------------------------
stage G_dagger_medium 3000 python3 experiments/medium_dagger.py \
  --env "$MEDIUM" --net gnn --hidden_dim 64 --rounds 4 \
  --episodes_per_round 48 --epochs0 10 --epochs_per_round 4 --stride 3 \
  --max_episodes 400 --collect_temperature 2.0 --eval_episodes 8 \
  --tag r4scale

CK=runs/dagger_medium_r4scale/ckpt_best
[ -d "$CK" ] || CK=runs/dagger_medium_r4scale/ckpt
stage G2_export_clone 900 python3 experiments/export_policy.py --cpu \
  --ckpt "$CK" --kind bc --env_id "$MEDIUM" --net gnn --hidden_dim 64 \
  --coordinated --temperature 3.0 \
  --out results_data/policy_dagger_clone_r4.stablehlo
cp -rf runs/dagger_medium_r4scale/result.json \
  results_data/dagger_medium_r4scale.json 2>/dev/null

# --- H. MAPPO warm-started from the DAgger clone (item 6) ---------------
stage H_mappo 3000 python3 experiments/medium_mappo.py --env "$MEDIUM" \
  --net gnn --hidden_dim 64 --num_envs 8 --num_strides 150 \
  --init_from "$CK" --eval_every 25 --eval_episodes 8 --tag warmstart
cp -f runs/mappo_medium_warmstart/result.json \
  results_data/mappo_medium_warmstart.json 2>/dev/null

# --- I. QMIX architecture shot: comm round (item 8) ----------------------
stage I_qmix_comm 2700 python3 experiments/medium_qmix_5k.py \
  --env_id "$MEDIUM" --num_episodes 5000 --coordinated --net gnode_comm \
  --eval_every 250 --eval_episodes 8 --tag comm
cp -f runs/qmix_medium_5k_comm/qmix_medium_5k.jsonl \
  results_data/qmix_medium_comm_5k.jsonl 2>/dev/null

# --- X*. extralarge leg (item 9; deadline-cut first) ---------------------
stage XA_datagen_xl 2400 python3 scripts/collect_data.py \
  --env_ids "$XL" --seeds 0 1000 2000 3000 4000 \
  --num_episodes 200 --batch 40 --out_dir datasets
stage XB_gde_xl_h4 3600 python3 experiments/medium_gde_ref_scale.py \
  --env "$XL" --epochs 25 --horizon 4 --checkpoint_every 2 \
  --scan_chunk 1000 --device_shard_episodes 250 \
  --out_dir /root/repo/runs/gde_extralarge_ref_h4
stage XB2_gde_xl_ms 1200 python3 experiments/gde_multistep.py \
  --env "$XL" --run_dir /root/repo/runs/gde_extralarge_ref_h4
stage XC_baselines_xl 1800 python3 experiments/medium_baselines_table.py \
  --env "$XL" --models lstm pos_gru pos_lstm --epochs 10 --save_params \
  --out_dir /root/repo/runs/baselines_extralarge
stage XC2_baselines_xl_ms 900 python3 experiments/baselines_multistep.py \
  --params_dir /root/repo/runs/baselines_extralarge --env "$XL"
stage XC3_qmix_xl 1800 python3 experiments/medium_qmix_5k.py \
  --env_id "$XL" --num_episodes 1200 --coordinated \
  --eval_every 250 --eval_episodes 8 --tag xl
harvest

# --- Z. always last: harvest + fresh bench -------------------------------
harvest
rm -f /tmp/r4_queue_stop  # bench must never be skipped by a stray stop file
HARD_DEADLINE=$(( $(date +%s) + 1500 ))
stage Z_bench 1400 python3 bench.py
echo "=== $(date -u +%H:%M:%S) r4 queue done" >> $QLOG
