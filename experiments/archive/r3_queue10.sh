#!/bin/bash
# Round-3 recovery queue (replaces queue8's tail + queue9) after the
# host-memory diagnosis: anonymous page faults on this VM run at
# ~4-30 MB/s, so the original dataset-heavy stage order stalled in
# loading. New order: dataset-free chip stages first while the mmap
# sidecar caches build on CPU in parallel; dataset stages run against
# the caches; full-scale DAgger last. Deadline-guarded as before.
cd /root/repo
# Keep glibc reusing faulted pages instead of mmap/munmap churn.
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
LARGE=tarware-large-15agvs-8pickers-partialobs-v1
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
SOFT_DEADLINE=$(date -ud "2026-08-18 18:50" +%s)
HARD_DEADLINE=$(date -ud "2026-08-18 19:35" +%s)

stage() {
  local name=$1; shift
  local now=$(date +%s)
  if [ -f /tmp/r3_queue_stop ] || [ "$now" -ge "$SOFT_DEADLINE" ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop/deadline)" >> /tmp/r3_queue.log
    return 0
  fi
  local budget=$((HARD_DEADLINE - now))
  echo "=== $(date -u +%H:%M:%S) stage $name (budget ${budget}s): $*" >> /tmp/r3_queue.log
  timeout -s TERM "$budget" "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> /tmp/r3_queue.log
}

echo "=== $(date -u +%H:%M:%S) queue10 start" >> /tmp/r3_queue.log

# Sidecar caches build on CPU while the chip runs dataset-free stages.
python3 scripts/build_obs_cache.py 'datasets/*large*.h5' \
  'datasets/*medium-19*.h5' > /tmp/r3_C_cache.log 2>&1 &
CACHEPID=$!

# --- dataset-free chip stages -------------------------------------
stage G_coma32 python3 experiments/medium_coma_curve.py \
  --num_envs 32 --num_episodes 2500 --entropy_decay 0.9999 \
  --eval_every 250 --eval_episodes 8 --tag envs32

stage F_qmix_large python3 experiments/medium_qmix_5k.py \
  --env_id "$LARGE" --num_episodes 1500 \
  --eval_every 250 --eval_episodes 8 --tag large

stage H_xl_sweep python3 experiments/xl_sweep.py

stage H_profile python3 experiments/profile_step.py

# --- dataset stages (need the caches) ------------------------------
wait $CACHEPID
echo "=== $(date -u +%H:%M:%S) caches ready" >> /tmp/r3_queue.log

stage D_gde_large python3 experiments/medium_gde_ref_scale.py \
  --env "$LARGE" --epochs 20 --horizon 4 --tag h4

stage E_baselines_large python3 experiments/medium_baselines_table.py \
  --env "$LARGE" --models lstm pos_lstm --epochs 10 \
  --save_params --gde_result /root/repo/runs/gde_large_ref_h4/result.json

stage D_gde_large_ms python3 experiments/gde_multistep.py \
  --env "$LARGE" --run_dir /root/repo/runs/gde_large_ref_h4

stage E_baselines_large_ms python3 experiments/baselines_multistep.py \
  --params_dir /root/repo/runs/baselines_large --env "$LARGE"

# --- full-scale DAgger + paired confirmation (headline) ------------
stage Q_dagger_medium python3 experiments/medium_dagger.py --env "$MEDIUM" \
  --net gnn --hidden_dim 64 --rounds 5 --episodes_per_round 32 \
  --epochs0 10 --epochs_per_round 4 --stride 4 --max_episodes 400 \
  --collect_temperature 2.0 --eval_episodes 8

stage U_paired_medium python3 experiments/paired_clone_eval.py \
  --env "$MEDIUM" --ckpt runs/dagger_medium/ckpt_best \
  --temps 2.0 3.0 3.5 --seeds 24 \
  --out runs/clone_paired_eval_medium_full.json

# --- bonus if time remains -----------------------------------------
INIT=runs/dagger_medium/ckpt_best
[ -d "$INIT" ] || INIT=runs/dagger_medium/ckpt
stage R_mappo_dagger python3 experiments/medium_mappo.py \
  --num_strides 125 --init_from "$INIT" --lr 1e-4 \
  --eval_every 25 --eval_episodes 8 --tag dagger_ft

stage T_dagger_large python3 experiments/medium_dagger.py --env "$LARGE" \
  --net gnn --hidden_dim 64 --rounds 5 --episodes_per_round 32 \
  --epochs0 10 --epochs_per_round 4 --stride 4 --max_episodes 400 \
  --collect_temperature 2.0 --eval_episodes 8

stage U_paired_large python3 experiments/paired_clone_eval.py \
  --env "$LARGE" --ckpt runs/dagger_large/ckpt_best \
  --temps 1.5 2.0 3.0 --seeds 24 \
  --out runs/clone_paired_eval_large_full.json

echo "=== $(date -u +%H:%M:%S) queue10 done" >> /tmp/r3_queue.log
