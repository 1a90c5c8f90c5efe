#!/bin/bash
# Round-3 TPU queue, part 7 — full-scale large DAgger + high-seed paired
# evals of the dispatcher-beating clones. Waits for queue6.
cd /root/repo
LARGE=tarware-large-15agvs-8pickers-partialobs-v1
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1

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

Q6PID=$(cat /tmp/r3_queue6.pid 2>/dev/null)
while [ -n "$Q6PID" ] && kill -0 "$Q6PID" 2>/dev/null; do
  sleep 60
done
until timeout 240 python3 -c "import jax; jax.devices()" 2>/dev/null; do
  echo "=== $(date -u +%H:%M:%S) queue7: TPU still unavailable" >> /tmp/r3_queue.log
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) queue7 start" >> /tmp/r3_queue.log

# Full-scale DAgger on large — the biggest expert-beating margin.
stage T_dagger_large python3 experiments/medium_dagger.py --env "$LARGE" \
  --net gnn --hidden_dim 64 --rounds 5 --episodes_per_round 32 \
  --epochs0 10 --epochs_per_round 4 --stride 4 --max_episodes 400 \
  --collect_temperature 2.0 --eval_episodes 8

# High-seed paired confirmations on chip (fast there).
stage U_paired_large python3 experiments/paired_clone_eval.py \
  --env "$LARGE" --ckpt runs/dagger_large/ckpt_best \
  --temps 1.5 2.0 3.0 --seeds 24 \
  --out runs/clone_paired_eval_large_full.json
stage U_paired_medium python3 experiments/paired_clone_eval.py \
  --env "$MEDIUM" --ckpt runs/dagger_medium/ckpt_best \
  --temps 2.0 3.0 3.5 --seeds 24 \
  --out runs/clone_paired_eval_medium_full.json

echo "=== $(date -u +%H:%M:%S) queue7 done" >> /tmp/r3_queue.log
