#!/bin/bash
# Round-3 TPU queue, part 2 (v2) — short stages first so results get
# banked before round end; probes the backend until it answers.
cd /root/repo
LARGE=tarware-large-15agvs-8pickers-partialobs-v1

# Stages stop starting after the deadline (UTC HHMM) or when the stop
# file exists, so a late TPU recovery can't leave a stage holding the
# chip when the round-end driver needs it (one TPU process at a time).
DEADLINE=${QUEUE_DEADLINE:-1045}
stage() {
  local name=$1; shift
  if [ -f /tmp/r3_queue_stop ] || [ "$(date -u +%H%M)" -ge "$DEADLINE" ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (deadline/stop)" >> /tmp/r3_queue.log
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name: $*" >> /tmp/r3_queue.log
  "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> /tmp/r3_queue.log
}

until timeout 240 python3 -c "import jax; jax.devices()" 2>/dev/null; do
  echo "=== $(date -u +%H:%M:%S) TPU still unavailable" >> /tmp/r3_queue.log
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) TPU back; queue2v2 start" >> /tmp/r3_queue.log

# Short stages first (bank results early).
stage H_bench python3 bench.py --verbose
stage H_xl_sweep python3 experiments/xl_sweep.py
stage H_profile python3 experiments/profile_step.py

# Large-size evidence (VERDICT item 4), shortest-useful versions.
stage E_baselines_large python3 experiments/medium_baselines_table.py \
  --env "$LARGE" --models lstm pos_lstm --epochs 10 \
  --save_params --gde_result /root/repo/runs/gde_large_ref_h4/result.json
stage F_qmix_large python3 experiments/medium_qmix_5k.py \
  --env_id "$LARGE" --num_episodes 1500 \
  --eval_every 250 --eval_episodes 8 --tag large
stage D_gde_large python3 experiments/medium_gde_ref_scale.py \
  --env "$LARGE" --epochs 20 --horizon 4 --tag h4
stage D_gde_large_ms python3 experiments/gde_multistep.py \
  --env "$LARGE" --run_dir /root/repo/runs/gde_large_ref_h4
stage E_baselines_large_ms python3 experiments/baselines_multistep.py \
  --params_dir /root/repo/runs/baselines_large --env "$LARGE"

# Only if time remains.
stage G_coma32 python3 experiments/medium_coma_curve.py \
  --num_envs 32 --num_episodes 2500 --entropy_decay 0.9999 \
  --eval_every 250 --eval_episodes 8 --tag envs32

echo "=== $(date -u +%H:%M:%S) queue2v2 done" >> /tmp/r3_queue.log
