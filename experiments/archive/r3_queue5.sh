#!/bin/bash
# Round-3 TPU queue, part 5 — DAgger at reference scale + COMA-checkpoint
# coordination eval. Waits for queue4 (experiments/r3_queue4.sh).
cd /root/repo
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1

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

Q4PID=$(cat /tmp/r3_queue4.pid 2>/dev/null)
while [ -n "$Q4PID" ] && kill -0 "$Q4PID" 2>/dev/null; do
  sleep 60
done
until timeout 240 python3 -c "import jax; jax.devices()" 2>/dev/null; do
  echo "=== $(date -u +%H:%M:%S) queue5: TPU still unavailable" >> /tmp/r3_queue.log
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) queue5 start" >> /tmp/r3_queue.log

# Coordination as a pure operator on the trained COMA checkpoint
# (argmax eval; minutes).
stage P_coma_coord_eval_base python3 experiments/eval_rl_checkpoint.py \
  --resume_from runs/coma_medium/ckpt --algo coma --seeds 2 \
  --eval_episodes 8 --out runs/coord_eval_tpu.jsonl
stage P_coma_coord_eval_coord python3 experiments/eval_rl_checkpoint.py \
  --resume_from runs/coma_medium/ckpt --algo coma --seeds 2 \
  --eval_episodes 8 --coordinated --out runs/coord_eval_tpu.jsonl

# DAgger at scale. CPU findings (RESULTS.md): rollout quality is
# NON-monotone in imitation strength — the 300-episode/12-epoch recipe
# rolled out worse (45-69 coord) than the 100-episode/8-epoch probe
# (78-85) despite better decision accuracy. Use the probe-like recipe
# with moderate data and rely on best-by-rollout checkpoint selection.
stage Q_dagger_medium python3 experiments/medium_dagger.py --env "$MEDIUM" \
  --net gnn --hidden_dim 64 --rounds 5 --episodes_per_round 32 \
  --epochs0 10 --epochs_per_round 4 --stride 4 --max_episodes 400 \
  --collect_temperature 2.0 --eval_episodes 8

echo "=== $(date -u +%H:%M:%S) queue5 done" >> /tmp/r3_queue.log
