#!/bin/bash
# Round-3 fresh-VM session queue (Aug 19). The VM reset wiped datasets/
# and runs/; this chain rebuilds every lost artifact, commits the
# serving blobs queue16 exported but never got into git, fills the
# pending large pos-model rollout rows, and completes the reference's
# own 4-size baseline sweep (train_baselines.py:455-461 sweeps
# tiny-3-2 / small-6-3 / medium-10-5 / large-15-8 — we had only
# medium-19-9 + large):
#  A. (gate) wait for the running medium-19-9 datagen (5 seeds), stop
#     the process before it rolls into the large env.
#  B. QMIX coordinated-training 20k rebuild + CPU blob export.
#  C. GDE medium h4, 100 epochs, chunked scan + multistep refresh +
#     CPU blob export.
#  D. large datagen (5 seeds x 200) -> pending pos_gru/pos_lstm rows.
#  F. tiny/small/medium10 datagen -> 4-size baselines sweep (T2 parity).
#  G. DAgger clone + light paired eval + clone blob.
#  H. fresh step profile + bench preflight last.
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
HARD_DEADLINE=$(date -ud "2026-08-19 13:30" +%s)
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
LARGE=tarware-large-15agvs-8pickers-partialobs-v1
QLOG=/tmp/r3_queue.log

stage() {
  local name=$1; shift
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  if [ -f /tmp/r3_queue18_stop ] || [ "$budget" -le 60 ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop/deadline)" >> $QLOG
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name (budget ${budget}s): $*" >> $QLOG
  timeout -s TERM "$budget" "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> $QLOG
}

# --- A. gate on the medium datagen, stop it before the large env -----
DGPID=$(cat /tmp/datagen.pid 2>/dev/null)
while [ -n "$DGPID" ] && kill -0 "$DGPID" 2>/dev/null; do
  if grep -q "Completed data collection for $MEDIUM with seed 4000" /tmp/datagen_r3c5.log 2>/dev/null; then
    echo "=== $(date -u +%H:%M:%S) medium datagen complete, stopping PID $DGPID before large" >> $QLOG
    kill -TERM "$DGPID" 2>/dev/null
    sleep 20
    kill -0 "$DGPID" 2>/dev/null && sleep 40
    break
  fi
  sleep 60
done
# remove any partial large files (the collector restarts incomplete
# files from scratch; a half-written h5 would waste its next attempt)
for s in 0 1000 2000 3000 4000; do
  f="datasets/warehouse_data_${LARGE}_seed${s}.h5"
  if [ -f "$f" ]; then
    n=$(python3 -c "import h5py,sys; f=h5py.File('$f','r'); print(sum(1 for k in f if k.startswith('episode_')))" 2>/dev/null || echo 0)
    [ "${n:-0}" -lt 200 ] && rm -f "$f" && echo "removed partial $f (n=$n)" >> $QLOG
  fi
done
echo "=== $(date -u +%H:%M:%S) queue18 start (medium datagen drained)" >> $QLOG

# --- B. QMIX coordtrain 20k + blob ------------------------------------
stage B_qmix_coordtrain20k python3 experiments/medium_qmix_5k.py \
  --env_id "$MEDIUM" --num_episodes 20000 --coordinated \
  --eval_every 500 --eval_episodes 8 --tag coordtrain

stage B2_export_qmix python3 experiments/export_policy.py --cpu \
  --ckpt runs/qmix_medium_5k_coordtrain/ckpt --kind qmix \
  --env_id "$MEDIUM" --net gnode --hidden_dim 64 --coordinated \
  --out results_data/policy_qmix_coordtrain20k.stablehlo

# --- C. GDE medium h4 (retry loop around the tunnel wedge) ------------
for a in 1 2 3; do
  stage C_gde_medium_h4_a$a python3 experiments/medium_gde_ref_scale.py \
    --env "$MEDIUM" --epochs 100 --horizon 4 --tag h4 \
    --checkpoint_every 2 --scan_chunk 2000
  if grep -q "best val" "/tmp/r3_C_gde_medium_h4_a$a.log" 2>/dev/null; then
    break
  fi
done

stage C2_gde_medium_ms python3 experiments/gde_multistep.py \
  --env "$MEDIUM" --run_dir /root/repo/runs/gde_medium_ref_h4

stage C3_export_gde_medium python3 experiments/export_gde.py --cpu \
  --ckpt runs/gde_medium_ref_h4/ckpt --env "$MEDIUM" \
  --horizon 4 --out results_data/gde_medium_h4.stablehlo

# --- D. large datagen + the pending pos-model rollout rows ------------
stage D_datagen_large python3 scripts/collect_data.py \
  --env_ids "$LARGE" --seeds 0 1000 2000 3000 4000 \
  --num_episodes 200 --batch 40 --out_dir datasets

stage D2_baselines_large python3 experiments/medium_baselines_table.py \
  --env "$LARGE" --models pos_gru pos_lstm --epochs 10 --save_params

stage D3_baselines_large_ms python3 experiments/baselines_multistep.py \
  --params_dir /root/repo/runs/baselines_large --env "$LARGE"

# --- F. 4-size baseline sweep (reference train_baselines parity) ------
stage F_datagen_sizes python3 scripts/collect_data.py \
  --env_ids tarware-tiny-3agvs-2pickers-partialobs-v1 \
            tarware-small-6agvs-3pickers-partialobs-v1 \
            tarware-medium-10agvs-5pickers-partialobs-v1 \
  --seeds 0 1000 2000 3000 4000 \
  --num_episodes 200 --batch 40 --out_dir datasets

# explicit out dirs: the drivers key on the env's size token, which
# would alias medium-10-5 with the flagship medium-19-9 dirs
F_baselines() {  # $1 short name, $2 env id
  stage F_baselines_$1 python3 experiments/medium_baselines_table.py \
    --env "$2" --models gru lstm pos_gru pos_lstm --epochs 10 \
    --save_params --out_dir "/root/repo/runs/baselines_$1"
}
F_baselines tiny tarware-tiny-3agvs-2pickers-partialobs-v1
F_baselines small tarware-small-6agvs-3pickers-partialobs-v1
F_baselines medium10 tarware-medium-10agvs-5pickers-partialobs-v1

# --- G. DAgger clone + paired eval + blob ------------------------------
stage G_dagger_medium python3 experiments/medium_dagger.py --env "$MEDIUM" \
  --net gnn --hidden_dim 64 --rounds 5 --episodes_per_round 32 \
  --epochs0 10 --epochs_per_round 4 --stride 4 --max_episodes 400 \
  --collect_temperature 2.0 --eval_episodes 8

CK=runs/dagger_medium/ckpt_best
[ -d "$CK" ] || CK=runs/dagger_medium/ckpt
stage G2_paired_medium python3 experiments/paired_clone_eval.py \
  --env "$MEDIUM" --ckpt "$CK" --temps 2.5 3.0 --seeds 12 \
  --out runs/clone_paired_eval_r3c5.json

stage G3_export_clone python3 experiments/export_policy.py --cpu \
  --ckpt "$CK" --kind bc --env_id "$MEDIUM" --net gnn --hidden_dim 64 \
  --coordinated --temperature 3.0 \
  --out results_data/policy_dagger_clone_T3.stablehlo

# --- H. profile + bench preflight (always last) ------------------------
stage H_profile python3 experiments/profile_step.py
stage X_bench python3 bench.py

echo "=== $(date -u +%H:%M:%S) queue18 done" >> $QLOG
