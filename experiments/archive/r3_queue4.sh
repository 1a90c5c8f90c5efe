#!/bin/bash
# Round-3 TPU queue, part 4 — coordinated COMA/IQL + large-size
# coordination transfer. Waits for queue3 (experiments/r3_queue3.sh).
cd /root/repo
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
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

Q3PID=$(cat /tmp/r3_queue3.pid 2>/dev/null)
while [ -n "$Q3PID" ] && kill -0 "$Q3PID" 2>/dev/null; do
  sleep 60
done
until timeout 240 python3 -c "import jax; jax.devices()" 2>/dev/null; do
  echo "=== $(date -u +%H:%M:%S) queue4: TPU still unavailable" >> /tmp/r3_queue.log
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) queue4 start" >> /tmp/r3_queue.log

# Cheap: coordination as a pure operator on the trained IQL checkpoint.
stage M_iql_coord_eval_base python3 experiments/eval_rl_checkpoint.py \
  --resume_from runs/iql_medium/ckpt --algo iql --seeds 2 \
  --eval_episodes 8 --out runs/coord_eval_tpu.jsonl
stage M_iql_coord_eval_coord python3 experiments/eval_rl_checkpoint.py \
  --resume_from runs/iql_medium/ckpt --algo iql --seeds 2 \
  --eval_episodes 8 --coordinated --out runs/coord_eval_tpu.jsonl

# Coordinated COMA at 32 envs: the exact-density sequential policy vs
# the uncoordinated 32-env run queued in queue2 (G_coma32).
stage N_coma32_coord python3 experiments/medium_coma_curve.py \
  --num_envs 32 --num_episodes 2500 --entropy_decay 0.9999 \
  --eval_every 250 --eval_episodes 8 --coordinated --tag envs32_coord

# Coordination transfer to large: short coordinated QMIX vs queue2's
# uncoordinated F_qmix_large (same budget).
stage O_qmix_large_coord python3 experiments/medium_qmix_5k.py \
  --env_id "$LARGE" --num_episodes 1500 --coordinated \
  --eval_every 250 --eval_episodes 8 --tag large_coord

echo "=== $(date -u +%H:%M:%S) queue4 done" >> /tmp/r3_queue.log
