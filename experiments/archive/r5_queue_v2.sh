#!/bin/bash
# Round-5 queue v2. Replaces r5_queue.sh (killed mid-stage at ~20:25 UTC;
# its running G3_dagger_large child was adopted — this script gates on
# that pid). Reasons for the v2: (a) train_bc's scan rewrite makes full
# 4-round DAgger runs ~10x cheaper, so proper r5scale clones for the
# honest-T protocol become affordable; (b) the v1 pass structure re-ran
# one_pass from a stale in-memory copy, so new stages could not be added
# to the running process.
#
# Order = round-4 VERDICT priority: comm curve (4), large QMIX plateau
# (5), honest-T clones (6), flagship 200-epoch recipe (3), extralarge
# leg (7), MAPPO (8), medium h1 + 4-size supervised restore (9, also
# 3's hypothesis check). Every stage artifact-gated; harvest + commit
# after every block.
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
LARGE=tarware-large-15agvs-8pickers-partialobs-v1
XL=tarware-extralarge-19agvs-9pickers-partialobs-v1
QLOG=/tmp/r5_queue.log
RD=results_data
HARD_DEADLINE=$(date -ud "2026-08-20 09:30" +%s)

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

qmix_large_at() {  # true if the large-QMIX curve reached $1 episodes
  python3 - "$1" <<'EOF'
import json, sys, pathlib
p = pathlib.Path("runs/qmix_medium_5k_coordtrain_large/qmix_medium_5k.jsonl")
try:
    last = json.loads(p.read_text().strip().splitlines()[-1])
    sys.exit(0 if last.get("episode", 0) >= int(sys.argv[1]) else 1)
except Exception:
    sys.exit(1)
EOF
}

gde_h4w_done() {  # true once the flagship reached the 200-epoch recipe
  python3 - <<'EOF'
import json, sys, pathlib
p = pathlib.Path("runs/gde_medium_ref_h4w/result.json")
try:
    sys.exit(0 if json.loads(p.read_text()).get("epochs", 0) >= 200 else 1)
except Exception:
    sys.exit(1)
EOF
}

# --- gate: wait for the adopted G3_dagger_large child to exit -------------
ADOPTED=$(cat /tmp/r5_adopted.pid 2>/dev/null)
while [ -n "$ADOPTED" ] && kill -0 "$ADOPTED" 2>/dev/null; do sleep 20; done
echo "=== $(date -u +%H:%M:%S) r5 queue v2 start (adopted stage drained)" >> $QLOG

# --- G3-post: export the large r4scale clone + honest-T trigger -----------
if [ ! -f $RD/policy_dagger_clone_large_r4.stablehlo ]; then
  CKL=runs/dagger_large_r4scale/ckpt_best
  [ -d "$CKL" ] || CKL=runs/dagger_large_r4scale/ckpt
  stage G4_export_clone_large 900 python3 experiments/export_policy.py \
    --cpu --ckpt "$CKL" --kind bc --env_id "$LARGE" --net gnn \
    --hidden_dim 64 --coordinated --temperature 3.0 \
    --out $RD/policy_dagger_clone_large_r4.stablehlo
  harvest
fi

# --- Z0: capture the new-default headline bench early ---------------------
if ! grep -q batched_env_steps /tmp/r5_Z0_bench.log 2>/dev/null; then
  stage Z0_bench 1400 python3 bench.py
fi

# --- I. CommRound real curve (VERDICT item 4) ------------------------------
if [ ! -f $RD/qmix_medium_comm_5k.jsonl ]; then
  stage I_qmix_comm 2700 python3 experiments/medium_qmix_5k.py \
    --env_id "$MEDIUM" --num_episodes 5000 --coordinated --net gnode_comm \
    --eval_every 250 --eval_episodes 8 --tag comm
  cp -f runs/qmix_medium_5k_comm/qmix_medium_5k.jsonl \
    $RD/qmix_medium_comm_5k.jsonl 2>/dev/null
  harvest
fi

# --- M. large QMIX to its 25-30k plateau (item 5; episodes are ADDITIVE) ---
if ! qmix_large_at 25500; then
  stage M_qmix_large_26k 5400 python3 experiments/medium_qmix_5k.py \
    --env_id "$LARGE" --num_episodes 8000 --coordinated \
    --eval_every 250 --eval_episodes 8 --tag coordtrain_large \
    --resume_from runs/qmix_medium_5k_coordtrain_large/ckpt
  stage M2_export_qmix_large 900 python3 experiments/export_policy.py --cpu \
    --ckpt runs/qmix_medium_5k_coordtrain_large/ckpt --kind qmix \
    --env_id "$LARGE" --net gnode --hidden_dim 64 --coordinated \
    --out $RD/policy_qmix_large_coordtrain.stablehlo
fi
cp -f runs/qmix_medium_5k_coordtrain_large/qmix_medium_5k.jsonl \
  $RD/qmix_large_coordtrain_resume.jsonl 2>/dev/null
harvest

# --- G5/G6. full 4-round DAgger clones with the scan-fast BC (item 6) ------
if [ ! -f $RD/dagger_medium_r5scale.json ]; then
  stage G5_dagger_medium_r5 4200 python3 experiments/medium_dagger.py \
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
if [ ! -f $RD/dagger_large_r5scale.json ]; then
  stage G6_dagger_large_r5 4800 python3 experiments/medium_dagger.py \
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

# --- J. flagship h4w to the clean 200-epoch recipe (item 3) ----------------
if ! gde_h4w_done; then
  stage J_gde_h4w_200 5400 python3 experiments/medium_gde_ref_scale.py \
    --env "$MEDIUM" --epochs 200 --horizon 4 --horizon_weights 3 1 1 1 \
    --tag h4w --checkpoint_every 2 --scan_chunk 2000
  stage J2_gde_h4w_ms 1200 python3 experiments/gde_multistep.py \
    --env "$MEDIUM" --run_dir /root/repo/runs/gde_medium_ref_h4w
  stage J3_export_gde_h4w 900 python3 experiments/export_gde.py --cpu \
    --ckpt runs/gde_medium_ref_h4w/ckpt --env "$MEDIUM" \
    --horizon 4 --out $RD/gde_medium_h4w.stablehlo
  harvest
fi

# --- K. medium h=1 GDE: the flagship-hypothesis reference point (items 3+9)
if [ ! -f $RD/sizes/gde_medium_ref__multistep.json ]; then
  stage K_gde_h1_200 4500 python3 experiments/medium_gde_ref_scale.py \
    --env "$MEDIUM" --epochs 200 --horizon 1 --checkpoint_every 5 \
    --scan_chunk 2000 --out_dir /root/repo/runs/gde_medium_ref
  stage K2_gde_h1_ms 1200 python3 experiments/gde_multistep.py \
    --env "$MEDIUM" --run_dir /root/repo/runs/gde_medium_ref
  harvest
fi

# --- X*. extralarge end-to-end leg (item 7) --------------------------------
if [ ! -f $RD/sizes/gde_extralarge_ref_h4__multistep.json ]; then
  ls datasets/*extralarge*.h5 >/dev/null 2>&1 || \
    stage XA_datagen_xl 2400 python3 scripts/collect_data.py \
      --env_ids "$XL" --seeds 0 1000 2000 3000 4000 \
      --num_episodes 200 --batch 40 --out_dir datasets
  stage XB_gde_xl_h4 3600 python3 experiments/medium_gde_ref_scale.py \
    --env "$XL" --epochs 25 --horizon 4 --checkpoint_every 2 \
    --scan_chunk 1000 --device_shard_episodes 250 \
    --out_dir /root/repo/runs/gde_extralarge_ref_h4
  stage XB2_gde_xl_ms 1200 python3 experiments/gde_multistep.py \
    --env "$XL" --run_dir /root/repo/runs/gde_extralarge_ref_h4
  harvest
fi
if [ ! -f $RD/qmix_xl.jsonl ]; then
  stage XC3_qmix_xl 1800 python3 experiments/medium_qmix_5k.py \
    --env_id "$XL" --num_episodes 1200 --coordinated \
    --eval_every 250 --eval_episodes 8 --tag xl
  cp -f runs/qmix_medium_5k_xl/qmix_medium_5k.jsonl \
    $RD/qmix_xl.jsonl 2>/dev/null
  harvest
fi

# --- H. MAPPO warm-started from the best available clone (item 8) ----------
if [ ! -f $RD/mappo_medium_warmstart.json ]; then
  CKH=runs/dagger_medium_r5scale/ckpt_best
  [ -d "$CKH" ] || CKH=runs/dagger_medium_r5scale/ckpt
  [ -d "$CKH" ] || CKH=runs/dagger_medium_r4scale/ckpt
  stage H_mappo 3000 python3 experiments/medium_mappo.py --env "$MEDIUM" \
    --net gnn --hidden_dim 64 --num_envs 8 --num_strides 150 \
    --init_from "$CKH" --eval_every 25 --eval_episodes 8 --tag warmstart
  cp -f runs/mappo_medium_warmstart/result.json \
    $RD/mappo_medium_warmstart.json 2>/dev/null
  harvest
fi

# --- D/F. baselines rows: large + tiny/small/medium10 (item 9) -------------
if [ ! -f $RD/sizes/baselines_large__multistep.json ]; then
  stage D_baselines_large 1500 python3 experiments/medium_baselines_table.py \
    --env "$LARGE" --models pos_gru pos_lstm --epochs 10 --save_params
  stage D2_baselines_large_ms 900 python3 experiments/baselines_multistep.py \
    --params_dir /root/repo/runs/baselines_large --env "$LARGE"
  harvest
fi
for size in tiny:tarware-tiny-3agvs-2pickers-partialobs-v1 \
            small:tarware-small-6agvs-3pickers-partialobs-v1 \
            medium10:tarware-medium-10agvs-5pickers-partialobs-v1; do
  s=${size%%:*}; e=${size#*:}
  if [ ! -f $RD/sizes/baselines_${s}__multistep.json ]; then
    stage F_baselines_$s 1500 python3 experiments/medium_baselines_table.py \
      --env "$e" --models gru lstm pos_gru pos_lstm --epochs 10 \
      --save_params --out_dir "/root/repo/runs/baselines_$s"
    stage F_baselines_${s}_ms 900 python3 experiments/baselines_multistep.py \
      --params_dir "/root/repo/runs/baselines_$s" --env "$e"
    harvest
  fi
done

# --- XF. per-size GDE h4 rows (item 9) --------------------------------------
for size in tiny:tarware-tiny-3agvs-2pickers-partialobs-v1 \
            small:tarware-small-6agvs-3pickers-partialobs-v1 \
            medium10:tarware-medium-10agvs-5pickers-partialobs-v1; do
  s=${size%%:*}; e=${size#*:}
  if [ ! -f $RD/sizes/gde_${s}_ref_h4__multistep.json ]; then
    stage XF_gde_$s 2400 python3 experiments/medium_gde_ref_scale.py \
      --env "$e" --epochs 30 --horizon 4 --checkpoint_every 5 \
      --scan_chunk 2000 --out_dir "/root/repo/runs/gde_${s}_ref_h4"
    stage XF_gde_${s}_ms 900 python3 experiments/gde_multistep.py \
      --env "$e" --run_dir "/root/repo/runs/gde_${s}_ref_h4"
    harvest
  fi
done

# --- E. GDE large h4w + blob (item 9 / flagship at large) -------------------
if [ ! -f $RD/gde_large_h4w.stablehlo ]; then
  stage E_gde_large_h4 4500 python3 experiments/medium_gde_ref_scale.py \
    --env "$LARGE" --epochs 50 --horizon 4 --horizon_weights 3 1 1 1 \
    --tag h4w --checkpoint_every 2 --scan_chunk 1500
  stage E2_gde_large_ms 1200 python3 experiments/gde_multistep.py \
    --env "$LARGE" --run_dir /root/repo/runs/gde_large_ref_h4w
  stage E3_export_gde_large 900 python3 experiments/export_gde.py --cpu \
    --ckpt runs/gde_large_ref_h4w/ckpt --env "$LARGE" \
    --horizon 4 --out $RD/gde_large_h4w.stablehlo
  harvest
fi

# --- L. medium baselines restore (item 9) ------------------------------------
if [ ! -f $RD/sizes/baselines_medium__multistep.json ]; then
  stage L_baselines_medium 2400 python3 experiments/medium_baselines_table.py \
    --env "$MEDIUM" --models gru lstm pos_gru pos_lstm --epochs 30 \
    --save_params --out_dir /root/repo/runs/baselines_medium
  stage L2_baselines_medium_ms 900 python3 experiments/baselines_multistep.py \
    --params_dir /root/repo/runs/baselines_medium --env "$MEDIUM"
  harvest
fi

# --- Z. final bench ----------------------------------------------------------
rm -f /tmp/r5_queue_stop
HARD_DEADLINE=$(( $(date +%s) + 1500 ))
stage Z_bench 1400 python3 bench.py
harvest
echo "=== $(date -u +%H:%M:%S) r5 queue v2 done" >> $QLOG
